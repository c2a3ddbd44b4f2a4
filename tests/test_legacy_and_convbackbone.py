import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vmrframe_tpu.layers.legacy_vsl import ConditionedPredictor, DynamicRNN, HighLightLayer


def test_highlight_layer_scores_and_loss():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 10, 8)).astype(np.float32))
    mask = jnp.ones((2, 10))
    mod = HighLightLayer()
    params = mod.init(jax.random.PRNGKey(0), x, mask)
    scores = mod.apply(params, x, mask)
    assert scores.shape == (2, 10)
    assert float(scores.min()) >= 0.0 and float(scores.max()) <= 1.0
    labels = jnp.zeros((2, 10)).at[:, 3:6].set(1.0)
    loss = HighLightLayer.compute_loss(scores, labels, mask)
    assert np.isfinite(float(loss)) and float(loss) > 0


@pytest.mark.parametrize("predictor", ["rnn", "encoder"])
def test_conditioned_predictor_shapes(predictor):
    rng = np.random.default_rng(0)
    B, L, D = 2, 12, 16
    x = jnp.asarray(rng.standard_normal((B, L, D)).astype(np.float32))
    mask = np.ones((B, L), np.float32)
    mask[:, 9:] = 0.0
    mask = jnp.asarray(mask)
    mod = ConditionedPredictor(dim=D, max_pos_len=L, predictor=predictor)
    params = mod.init(jax.random.PRNGKey(0), x, mask)
    s, e = mod.apply(params, x, mask)
    assert s.shape == (B, L) and e.shape == (B, L)
    # masked positions pushed to -inf-ish
    assert float(s[0, 9]) < -1e29


def test_conv_backbone_pyramid(af_cfg=None):
    import os

    from vmrframe_tpu.config import load_config
    from vmrframe_tpu.layers.actionformer import ConvBackbone

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 32, 16)).astype(np.float32))
    mask = jnp.ones((2, 32))
    mod = ConvBackbone(n_in=16, n_embd=16, n_embd_ks=3, arch=(1, 1, 3))
    params = mod.init(jax.random.PRNGKey(0), x, mask)
    feats, masks = mod.apply(params, x, mask)
    assert [f.shape[1] for f in feats] == [32, 16, 8, 4]
    assert [m.shape[1] for m in masks] == [32, 16, 8, 4]


def test_actionformer_conv_backbone_trains():
    import os

    from vmrframe_tpu.config import Derived, load_config
    from vmrframe_tpu.data.af_batcher import ActionFormerBatcher
    from vmrframe_tpu.testing import make_synthetic_data
    from vmrframe_tpu.train.trainer import Trainer

    cfg = load_config(os.path.join(os.path.dirname(__file__), "configs",
                                   "charades_actionformer.yaml"))
    cfg = cfg.updated({"actionformer.backbone_type": "conv"})
    dataset, store = make_synthetic_data(cfg, seed=0, n_train=8, n_test=8)
    derived = Derived(num_words=dataset["n_words"], num_chars=dataset["n_chars"],
                      num_train_steps=1, steps_per_epoch=1)
    train_b = ActionFormerBatcher(dataset["train_set"], store, cfg, derived, "train")
    trainer = Trainer(cfg, derived, dataset["word_vector"])
    rng = jax.random.PRNGKey(0)
    state = trainer.init_state(rng, next(train_b.epoch(seed=0)))
    step = trainer.compiled_train_step()
    state, m = step(state, trainer._shard_batch(next(train_b.epoch(seed=0))), rng)
    assert np.isfinite(float(m["loss"]))


def test_fpn1d_neck():
    import jax
    import jax.numpy as jnp

    from vmrframe_tpu.layers.actionformer import FPN1D

    rng = np.random.default_rng(0)
    feats = [jnp.asarray(rng.standard_normal((2, L, 16)).astype(np.float32)) for L in (32, 16, 8)]
    masks = [jnp.ones((2, L)) for L in (32, 16, 8)]
    mod = FPN1D(num_levels=3, out_channel=16)
    params = mod.init(jax.random.PRNGKey(0), feats, masks)
    out_f, out_m = mod.apply(params, feats, masks)
    assert [f.shape for f in out_f] == [(2, 32, 16), (2, 16, 16), (2, 8, 16)]
    assert all(np.isfinite(np.asarray(f)).all() for f in out_f)


def test_windowed_attention_rel_pe():
    import jax
    import jax.numpy as jnp

    from vmrframe_tpu.layers.actionformer import MaskedMHCA

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 16, 8)).astype(np.float32))
    mask = jnp.ones((2, 16))
    mod = MaskedMHCA(8, 2, window_size=5, use_rel_pe=True)
    params = mod.init(jax.random.PRNGKey(0), x, mask)
    assert params["params"]["rel_pe"].shape == (2, 5)
    out, _ = mod.apply(params, x, mask)
    assert np.isfinite(np.asarray(out)).all()
