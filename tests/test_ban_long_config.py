"""The shipped long-video BAN config (configs/tacos_ban_long.yaml): parses,
its pooling recipe tiles the full 128-grid, and a scaled-down twin trains.
On-chip numbers live in docs/BENCH_BAN_LONG.json."""

import os

import jax
import numpy as np

from vmrframe_tpu.config import Derived, load_config
from vmrframe_tpu.models.ban import _mask_meta
from vmrframe_tpu.testing import make_synthetic_data
from vmrframe_tpu.train.trainer import Trainer

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
CFG = os.path.join(REPO, "configs", "tacos_ban_long.yaml")


def test_long_ban_config_parses_and_covers_grid():
    cfg = load_config(CFG)
    m = cfg.model
    assert int(m.vlen) == 128 and list(m.pooling_counts) == [15, 8, 8, 8]
    mask, offsets, ii, jj = _mask_meta(list(m.pooling_counts), int(m.vlen))
    # the 2D-TAN TACoS recipe reaches the full-span diagonal (offset 127)
    assert int(max(offsets)) == 127
    # log-spaced sparsity: far fewer valid cells than the dense upper triangle
    assert 128 < mask.sum() < 128 * 129 // 2 / 2


def test_long_ban_scaled_twin_trains():
    """Same schema/pooling recipe at CPU-feasible dims — the full 4-stage
    offset ladder (max offset 127) exercised inside a real train+eval
    cycle."""
    cfg = load_config(CFG).updated({
        "model.vdim": 32, "model.dim": 32, "model.fuse_dim": 64,
        "model.query_embed_dim": 50, "model.word_dim": 50,
        "model.contrast_dim": 16, "model.topk": 4, "model.neighbor": 2,
        "model.prop_num": 12, "gcn.hidden_size": 64, "gcn.k": 12,
        "loss.hidden_size": 64,
    })
    dataset, store = make_synthetic_data(cfg, seed=0, n_train=8, n_test=8)
    derived = Derived(num_words=dataset["n_words"], num_chars=dataset["n_chars"],
                      num_train_steps=4, steps_per_epoch=2)
    from vmrframe_tpu.registry import get_model_entry

    entry = get_model_entry("BAN")
    train_b = entry.batcher_cls(dataset["train_set"], store, cfg, derived, "train")
    test_b = entry.batcher_cls(dataset["test_set"], store, cfg, derived, "test")
    trainer = Trainer(cfg, derived, dataset["word_vector"])
    state = trainer.init_state(jax.random.PRNGKey(0), next(train_b.epoch(seed=0)))
    step = trainer.compiled_train_step()
    for batch in train_b.epoch(seed=0):
        state, m = step(state, trainer._shard_batch(batch), jax.random.PRNGKey(1))
        assert np.isfinite(float(m["loss"]))
    ious, _, _ = trainer.run_eval_epoch(state, test_b.epoch(seed=0))
    assert len(ious) == 8
