"""Every registered 1D model must train a step and eval deterministically."""

import jax
import numpy as np
import pytest

from vmrframe_tpu.config import Derived
from vmrframe_tpu.data.batcher import Batcher
from vmrframe_tpu.registry import MODEL_REGISTRY, get_model_entry
from vmrframe_tpu.testing import make_synthetic_data
from vmrframe_tpu.train.trainer import Trainer

ZOO_1D = ["SeqPAN", "BaseFast", "BackBone", "BackBoneActionFormer"]


@pytest.fixture(scope="module")
def data(charades_cfg):
    dataset, store = make_synthetic_data(charades_cfg, seed=0, n_train=32, n_test=16)
    derived = Derived(num_words=dataset["n_words"], num_chars=dataset["n_chars"],
                      num_train_steps=10, steps_per_epoch=2)
    return dataset, store, derived


@pytest.mark.parametrize("name", ZOO_1D)
def test_model_trains_and_evals(name, charades_cfg, data):
    dataset, store, derived = data
    cfg = charades_cfg.updated({"model.name": name})
    train_b = Batcher(dataset["train_set"], store, cfg, derived, "train")
    test_b = Batcher(dataset["test_set"], store, cfg, derived, "test")
    trainer = Trainer(cfg, derived, dataset["word_vector"])
    rng = jax.random.PRNGKey(0)
    state = trainer.init_state(rng, next(train_b.epoch(seed=0)))
    step = trainer.compiled_train_step()
    losses = []
    for batch in train_b.epoch(seed=0):
        state, m = step(state, trainer._shard_batch(batch), rng)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all(), f"{name}: non-finite loss"
    ious1, _, _ = trainer.run_eval_epoch(state, test_b.epoch(seed=0))
    ious2, _, _ = trainer.run_eval_epoch(state, test_b.epoch(seed=0))
    np.testing.assert_allclose(ious1, ious2, atol=1e-6)


def test_registry_contains_zoo():
    get_model_entry("SeqPAN")  # triggers zoo import
    for name in ZOO_1D:
        assert name in MODEL_REGISTRY


def test_unknown_model_raises():
    with pytest.raises(KeyError, match="unknown model"):
        get_model_entry("NoSuchModel")
