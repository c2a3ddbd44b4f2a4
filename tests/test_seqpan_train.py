"""End-to-end: SeqPAN on synthetic data, multi-device CPU mesh."""

import jax
import numpy as np
import pytest

from vmrframe_tpu.config import Derived
from vmrframe_tpu.data.batcher import Batcher
from vmrframe_tpu.metrics import get_i345_mi
from vmrframe_tpu.testing import make_synthetic_data
from vmrframe_tpu.train.trainer import Trainer, fit


@pytest.fixture(scope="module")
def setup(charades_cfg):
    cfg = charades_cfg
    dataset, store = make_synthetic_data(cfg, seed=0)
    derived = Derived(num_words=dataset["n_words"], num_chars=dataset["n_chars"])
    train_b = Batcher(dataset["train_set"], store, cfg, derived, "train")
    test_b = Batcher(dataset["test_set"], store, cfg, derived, "test")
    derived.steps_per_epoch = len(train_b)
    derived.num_train_steps = len(train_b) * cfg.train.epochs
    trainer = Trainer(cfg, derived, dataset["word_vector"])
    return cfg, derived, trainer, train_b, test_b


def test_mesh_has_8_devices(setup):
    _, _, trainer, _, _ = setup
    assert trainer.mesh.devices.size == 8  # conftest forces 8 CPU devices


def test_batch_shapes_static(setup):
    cfg, derived, _, train_b, _ = setup
    batches = list(train_b.epoch(seed=0))
    B, L, T, C = cfg.train.batch_size, cfg.model.vlen, cfg.model.tlen, derived.char_len
    for batch in batches:
        assert batch["vfeats"].shape == (B, L, cfg.model.vdim)
        assert batch["char_ids"].shape == (B, T, C)
        assert batch["label1ds"].shape == (B, 2, L)
    # last batch is padded; sample_mask covers exactly the dataset
    total = sum(int(b["sample_mask"].sum()) for b in batches)
    assert total == len(train_b.dataset)


def test_train_steps_decrease_loss(setup):
    cfg, derived, trainer, train_b, _ = setup
    rng = jax.random.PRNGKey(0)
    state = trainer.init_state(rng, next(train_b.epoch(seed=0)))
    step = trainer.compiled_train_step()
    losses = []
    for i in range(6):
        for batch in train_b.epoch(seed=i):
            state, m = step(state, trainer._shard_batch(batch), rng)
            losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-4:]) < np.mean(losses[:4])


def test_eval_deterministic(setup):
    cfg, derived, trainer, train_b, test_b = setup
    rng = jax.random.PRNGKey(0)
    state = trainer.init_state(rng, next(train_b.epoch(seed=0)))
    ious1, _, _ = trainer.run_eval_epoch(state, test_b.epoch(seed=0))
    ious2, _, _ = trainer.run_eval_epoch(state, test_b.epoch(seed=0))
    np.testing.assert_allclose(ious1, ious2, atol=1e-6)
    r1i3, r1i5, r1i5b, r1i7, mi = get_i345_mi(ious1)
    assert 0 <= mi <= 100


def test_fit_two_epochs_and_checkpoint(tmp_path, setup):
    cfg, derived, trainer, train_b, test_b = setup
    result = fit(trainer, train_b, test_b, rng_seed=0, ckpt_dir=str(tmp_path), log=lambda *_: None)
    assert len(result["history"]) == cfg.train.epochs
    assert result["best_path"] is not None

    from vmrframe_tpu.train.checkpoints import restore_into_state

    state = trainer.init_state(jax.random.PRNGKey(1), next(train_b.epoch(seed=0)))
    restored = restore_into_state(result["best_path"], state)
    ious_a, _, _ = trainer.run_eval_epoch(result["state"], test_b.epoch(seed=0))
    # restoring best params yields the recorded best metric
    ious_b, _, _ = trainer.run_eval_epoch(restored, test_b.epoch(seed=0))
    _, _, _, _, mi_b = get_i345_mi(ious_b)
    assert mi_b == pytest.approx(result["best_miou"], abs=1e-3)


def test_prng_impl_threefry_knob(setup, charades_cfg):
    """train.prng_impl selects the dropout/gumbel generator; 'threefry'
    restores the pre-rbg stream and trains identically-shaped state."""
    cfg = charades_cfg.updated({"train.epochs": 1, "train.prng_impl": "threefry"})
    dataset, store = make_synthetic_data(cfg, seed=0, n_train=16, n_test=8)
    derived = Derived(num_words=dataset["n_words"], num_chars=dataset["n_chars"])
    train_b = Batcher(dataset["train_set"], store, cfg, derived, "train")
    test_b = Batcher(dataset["test_set"], store, cfg, derived, "test")
    derived.steps_per_epoch = len(train_b)
    derived.num_train_steps = len(train_b)
    trainer = Trainer(cfg, derived, dataset["word_vector"])
    result = fit(trainer, train_b, test_b, rng_seed=0, log=lambda *_: None)
    assert np.isfinite(result["best_miou"])
