import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vmrframe_tpu.config import Derived
from vmrframe_tpu.data.batcher import Batcher
from vmrframe_tpu.testing import make_synthetic_data
from vmrframe_tpu.train.trainer import Trainer


def test_gauss_weight_properties():
    from vmrframe_tpu.models.cpl import generate_gauss_weight

    L = 32
    center = jnp.asarray([0.5, 0.1])
    width = jnp.asarray([0.2, 0.4])
    vmask = jnp.ones((2, L))
    w = np.asarray(generate_gauss_weight(L, center, width, vmask))
    assert w.shape == (2, L)
    np.testing.assert_allclose(w.max(axis=1), 1.0, atol=1e-6)
    # peak near center fraction
    assert abs(np.argmax(w[0]) / (L - 1) - 0.5) < 0.1


def test_cpl_trains_weakly_supervised(charades_cfg):
    cfg = charades_cfg.updated({
        "model.name": "CPL",
        "others": {"cpl_num_props": 4, "cpl_div_lambda": 0.15, "cpl_div_loss_alhpa": 1.0},
    })
    dataset, store = make_synthetic_data(cfg, seed=0, n_train=16, n_test=8)
    derived = Derived(num_words=dataset["n_words"], num_chars=dataset["n_chars"],
                      num_train_steps=2, steps_per_epoch=2)
    train_b = Batcher(dataset["train_set"], store, cfg, derived, "train")
    test_b = Batcher(dataset["test_set"], store, cfg, derived, "test")
    trainer = Trainer(cfg, derived, dataset["word_vector"])
    rng = jax.random.PRNGKey(0)
    state = trainer.init_state(rng, next(train_b.epoch(seed=0)))
    step = trainer.compiled_train_step()
    for batch in train_b.epoch(seed=0):
        state, m = step(state, trainer._shard_batch(batch), rng)
        assert np.isfinite(float(m["loss"]))
    ious, _, _, props = trainer.run_eval_epoch(state, test_b.epoch(seed=0), collect_props=True)
    assert np.all(props[:, 0] <= props[:, 1] + 1e-6)
    assert np.all(props >= 0) and np.all(props <= 1)
