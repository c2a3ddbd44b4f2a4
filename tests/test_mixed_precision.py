import jax
import jax.numpy as jnp
import numpy as np

from vmrframe_tpu.config import Derived
from vmrframe_tpu.data.batcher import Batcher
from vmrframe_tpu.testing import make_synthetic_data
from vmrframe_tpu.train.trainer import Trainer


def test_bfloat16_compute_trains_and_keeps_f32_params(charades_cfg):
    cfg = charades_cfg.updated({"train.compute_dtype": "bfloat16"})
    dataset, store = make_synthetic_data(cfg, seed=0, n_train=16, n_test=8)
    derived = Derived(num_words=dataset["n_words"], num_chars=dataset["n_chars"],
                      num_train_steps=2, steps_per_epoch=2)
    train_b = Batcher(dataset["train_set"], store, cfg, derived, "train")
    test_b = Batcher(dataset["test_set"], store, cfg, derived, "test")
    trainer = Trainer(cfg, derived, dataset["word_vector"])
    assert trainer.compute_dtype == jnp.bfloat16
    rng = jax.random.PRNGKey(0)
    state = trainer.init_state(rng, next(train_b.epoch(seed=0)))
    step = trainer.compiled_train_step()
    for batch in train_b.epoch(seed=0):
        state, m = step(state, trainer._shard_batch(batch), rng)
        assert np.isfinite(float(m["loss"]))
    # master params stay float32
    for leaf in jax.tree_util.tree_leaves(state.params):
        assert leaf.dtype == jnp.float32
    ious, _, _ = trainer.run_eval_epoch(state, test_b.epoch(seed=0))
    assert len(ious) == len(dataset["test_set"])


def test_bf16_eval_close_to_f32(charades_cfg):
    dataset, store = make_synthetic_data(charades_cfg, seed=0, n_train=16, n_test=8)
    derived = Derived(num_words=dataset["n_words"], num_chars=dataset["n_chars"],
                      num_train_steps=2, steps_per_epoch=2)
    test_b = Batcher(dataset["test_set"], store, charades_cfg, derived, "test")
    t32 = Trainer(charades_cfg, derived, dataset["word_vector"])
    rng = jax.random.PRNGKey(0)
    state = t32.init_state(rng, next(test_b.epoch(seed=0)))
    ious32, _, _ = t32.run_eval_epoch(state, test_b.epoch(seed=0))

    cfg16 = charades_cfg.updated({"train.compute_dtype": "bfloat16"})
    t16 = Trainer(cfg16, derived, dataset["word_vector"])
    state16 = jax.device_put(state, t16._repl)
    t16.entry = t32.entry
    ious16, _, _ = t16.run_eval_epoch(state16, test_b.epoch(seed=0))
    # same untrained params: most spans agree; mean IoU within a few points
    assert abs(np.mean(ious32) - np.mean(ious16)) < 0.1
