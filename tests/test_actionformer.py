import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vmrframe_tpu.config import Derived, load_config
from vmrframe_tpu.data.af_batcher import ActionFormerBatcher, linear_resize
from vmrframe_tpu.metrics import get_i345_mi
from vmrframe_tpu.ops.nms import nms_1d
from vmrframe_tpu.testing import make_synthetic_data
from vmrframe_tpu.train.trainer import Trainer


@pytest.fixture(scope="module")
def af_cfg():
    return load_config(os.path.join(os.path.dirname(__file__), "configs", "charades_actionformer.yaml"))


def test_linear_resize_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    for t0 in (17, 64, 100):
        x = rng.standard_normal((t0, 8)).astype(np.float32)
        got = linear_resize(x, 64)
        want = (
            torch.nn.functional.interpolate(
                torch.tensor(x.T).unsqueeze(0), size=64, mode="linear", align_corners=False
            )
            .squeeze(0)
            .numpy()
            .T
        )
        np.testing.assert_allclose(got, want, atol=1e-5)


def test_nms_hard_suppresses_overlaps():
    segs = jnp.asarray([[0.0, 10.0], [1.0, 11.0], [20.0, 30.0]])
    scores = jnp.asarray([0.9, 0.8, 0.7])
    kept, kscores, valid = nms_1d(segs, scores, iou_threshold=0.5, max_keep=3,
                                  min_score=0.01, method=0, sigma=0.5)
    kept = np.asarray(kept)[np.asarray(valid)]
    # the overlapping [1, 11] must be suppressed
    assert kept.shape[0] == 2
    np.testing.assert_allclose(kept[0], [0, 10])
    np.testing.assert_allclose(kept[1], [20, 30])


def test_nms_soft_decays_scores():
    segs = jnp.asarray([[0.0, 10.0], [0.0, 10.0], [20.0, 30.0]])
    scores = jnp.asarray([0.9, 0.85, 0.5])
    kept, kscores, valid = nms_1d(segs, scores, iou_threshold=0.1, max_keep=3,
                                  min_score=0.001, method=2, sigma=0.5)
    kscores = np.asarray(kscores)
    # duplicate decayed: second pick is the far segment, not the duplicate
    np.testing.assert_allclose(np.asarray(kept)[1], [20, 30])
    assert kscores[0] == pytest.approx(0.9)


def test_label_points_single_video(af_cfg):
    from vmrframe_tpu.models.actionformer import _points, label_points

    pts = jnp.asarray(_points(af_cfg))
    gt = jnp.asarray([[10.0, 30.0]])
    cls_t, reg_t = label_points(pts, gt, af_cfg)
    cls_t, reg_t = np.asarray(cls_t)[0], np.asarray(reg_t)[0]
    pos = np.where(cls_t > 0)[0]
    assert pos.size > 0
    # every positive point lies inside the (center-sampled) gt and in its
    # regression range, with non-negative normalized offsets
    p = np.asarray(pts)
    assert np.all(reg_t[pos] >= 0)
    max_reg = np.maximum.reduce(np.asarray(reg_t[pos]) * p[pos, 3:4], axis=1)
    assert np.all(max_reg >= p[pos, 1]) and np.all(max_reg <= p[pos, 2])


def test_actionformer_trains_and_evals(af_cfg):
    dataset, store = make_synthetic_data(af_cfg, seed=0, n_train=16, n_test=8)
    derived = Derived(num_words=dataset["n_words"], num_chars=dataset["n_chars"],
                      num_train_steps=4, steps_per_epoch=2)
    train_b = ActionFormerBatcher(dataset["train_set"], store, af_cfg, derived, "train")
    test_b = ActionFormerBatcher(dataset["test_set"], store, af_cfg, derived, "test")
    trainer = Trainer(af_cfg, derived, dataset["word_vector"])
    rng = jax.random.PRNGKey(0)
    state = trainer.init_state(rng, next(train_b.epoch(seed=0)))
    step = trainer.compiled_train_step()
    norm0 = float(state.extras["loss_normalizer"])
    for batch in train_b.epoch(seed=0):
        state, m = step(state, trainer._shard_batch(batch), rng)
        assert np.isfinite(float(m["loss"]))
    # EMA normalizer updated through the jitted step
    assert float(state.extras["loss_normalizer"]) != norm0
    ious, _, _ = trainer.run_eval_epoch(state, test_b.epoch(seed=0))
    r1i3, r1i5, _, r1i7, mi = get_i345_mi(ious)
    assert 0.0 <= mi <= 100.0
    # predictions are fractions inside the video
    _, _, _, props = trainer.run_eval_epoch(state, test_b.epoch(seed=0), collect_props=True)
    assert np.all(props >= 0.0) and np.all(props <= 1.0)


def test_fast_top1_matches_full():
    """actionformer_infer's argmax shortcut == the full NMS path's first
    kept segment (greedy NMS's first pick is the undegraded argmax)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vmrframe_tpu.config import load_config
    from vmrframe_tpu.models.actionformer import (
        _decode_and_nms, _grid_to_seconds, _points, actionformer_infer)

    cfg = load_config("tests/configs/charades_actionformer.yaml")
    P = len(_points(cfg))
    rng = np.random.default_rng(0)
    B = 4
    outputs = {
        "cls_logits": jnp.asarray(rng.normal(size=(B, P, 1)).astype(np.float32)),
        "offsets": jnp.asarray(np.abs(rng.normal(size=(B, P, 2))).astype(np.float32)),
        "fpn_mask": jnp.ones((B, P), jnp.float32),
    }
    batch = {
        "feat_stride": jnp.full((B,), 4.0),
        "feat_num_frames": jnp.full((B,), 16.0),
        "fps": jnp.full((B,), 30.0),
        "duration": jnp.asarray(rng.uniform(10, 40, size=(B,)).astype(np.float32)),
    }
    fast = actionformer_infer(outputs, batch, cfg)
    kept_segs, _, _ = _decode_and_nms(outputs, cfg)
    full_top1 = _grid_to_seconds(kept_segs[:, 0], batch) / batch["duration"][:, None]
    np.testing.assert_allclose(np.asarray(fast), np.asarray(full_top1),
                               atol=1e-6, rtol=1e-6)

    # degenerate batch: every candidate below pre_nms_thresh -> the NMS path
    # flags everything valid=False; the fast path (which has no validity
    # channel) must emit a zero-LENGTH span, not argmax's arbitrary cell-0
    # segment
    outputs_low = dict(outputs)
    outputs_low["cls_logits"] = jnp.full((B, P, 1), -20.0)
    fast = np.asarray(actionformer_infer(outputs_low, batch, cfg))
    _, _, valids = _decode_and_nms(outputs_low, cfg)
    assert not bool(np.asarray(valids).any())
    expected = np.asarray(
        _grid_to_seconds(jnp.zeros((B, 2)), batch) / batch["duration"][:, None])
    np.testing.assert_allclose(fast, expected, atol=1e-6, rtol=1e-6)
    np.testing.assert_allclose(fast[:, 0], fast[:, 1], atol=1e-6)
