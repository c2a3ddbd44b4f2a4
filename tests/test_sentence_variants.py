import jax
import numpy as np
import pytest

from vmrframe_tpu.config import Derived
from vmrframe_tpu.registry import get_model_entry
from vmrframe_tpu.testing import make_synthetic_data
from vmrframe_tpu.train.trainer import Trainer


def test_hashed_bow_encoder_deterministic():
    from vmrframe_tpu.data.sentence_encoder import HashedBoWEncoder

    enc = HashedBoWEncoder(64)
    a = enc.encode("a person opens the door")
    b = HashedBoWEncoder(64).encode("a person opens the door")
    np.testing.assert_array_equal(a, b)
    c = enc.encode("a person closes the door")
    assert not np.allclose(a, c)


@pytest.mark.parametrize("name", ["BackBoneBertSentence", "BackBoneAlignFeature"])
def test_sentence_variant_trains(name, charades_cfg):
    updates = {"model.name": name}
    if name == "BackBoneAlignFeature":
        updates["model.dim"] = 32  # must match sentence dim for the L1 align
    cfg = charades_cfg.updated(updates)
    dataset, store = make_synthetic_data(cfg, seed=0, n_train=16, n_test=8)
    derived = Derived(num_words=dataset["n_words"], num_chars=dataset["n_chars"],
                      num_train_steps=2, steps_per_epoch=2)
    entry = get_model_entry(name)
    batcher_cls = entry.batcher_cls
    batcher_cls.sentence_dim = 32  # small dim for tests
    train_b = batcher_cls(dataset["train_set"], store, cfg, derived, "train")
    test_b = batcher_cls(dataset["test_set"], store, cfg, derived, "test")
    trainer = Trainer(cfg, derived, dataset["word_vector"])
    rng = jax.random.PRNGKey(0)
    state = trainer.init_state(rng, next(train_b.epoch(seed=0)))
    step = trainer.compiled_train_step()
    for batch in train_b.epoch(seed=0):
        state, m = step(state, trainer._shard_batch(batch), rng)
        assert np.isfinite(float(m["loss"])), f"{name}: non-finite loss"
    ious, _, _ = trainer.run_eval_epoch(state, test_b.epoch(seed=0))
    assert len(ious) == len(dataset["test_set"])
    batcher_cls.sentence_dim = 768  # restore
