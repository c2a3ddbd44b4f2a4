"""Regression guard: the jitted train step must compile exactly once.

A weak-typed leaf anywhere in TrainState (e.g. the ActionFormer EMA loss
normalizer before the fix) changes the jit signature after the first update
and silently recompiles every step — a 100-400x slowdown in production."""

import jax
import numpy as np
import pytest

from vmrframe_tpu.config import Derived
from vmrframe_tpu.registry import get_model_entry
from vmrframe_tpu.testing import make_synthetic_data
from vmrframe_tpu.train.trainer import Trainer


@pytest.mark.parametrize("name,cfg_file", [
    ("SeqPAN", "charades_seqpan.yaml"),
    ("ActionFormer", "charades_actionformer.yaml"),
    ("BAN", "charades_ban.json"),
])
def test_train_step_compiles_once(name, cfg_file):
    import os

    from vmrframe_tpu.config import load_config
    from vmrframe_tpu.data.batcher import Batcher

    cfg = load_config(os.path.join(os.path.dirname(__file__), "configs", cfg_file))
    entry = get_model_entry(name)
    batcher_cls = entry.batcher_cls or Batcher
    dataset, store = make_synthetic_data(cfg, seed=0, n_train=3 * cfg.train.batch_size, n_test=8)
    derived = Derived(num_words=dataset["n_words"], num_chars=dataset["n_chars"],
                      num_train_steps=6, steps_per_epoch=3)
    b = batcher_cls(dataset["train_set"], store, cfg, derived, "train")
    trainer = Trainer(cfg, derived, dataset["word_vector"])
    rng = jax.random.PRNGKey(0)
    state = trainer.init_state(rng, next(b.epoch(seed=0)))
    step = trainer.compiled_train_step()
    for batch in b.epoch(seed=0):
        state, m = step(state, trainer._shard_batch(batch), rng)
    assert np.isfinite(float(m["loss"]))
    assert step._cache_size() == 1, (
        f"{name}: train step recompiled ({step._cache_size()} cache entries) — "
        "some state leaf changes dtype/weak-type between steps"
    )
