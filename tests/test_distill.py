"""Distillation family: OneTeacher, frozen-teacher variants, MultiTeacher,
CCA-pretrain, plus the teacher-label export flywheel."""

import os
import pickle

import jax
import numpy as np
import pytest

from vmrframe_tpu.config import Derived
from vmrframe_tpu.data.batcher import Batcher
from vmrframe_tpu.data.distill_batcher import MultiTeacherBatcher, linear_resample_ac
from vmrframe_tpu.registry import get_model_entry
from vmrframe_tpu.testing import make_synthetic_data
from vmrframe_tpu.train.trainer import Trainer


def _mk(cfg_base, name, extra=None):
    updates = {"model.name": name,
               "loss.temperature": 3,
               "loss.sd": 1.0, "loss.t0": 1.0,
               "teacher0.model": cfg_base.model.to_dict()}
    if extra:
        updates.update(extra)
    return cfg_base.updated(updates)


@pytest.fixture(scope="module")
def data(charades_cfg):
    dataset, store = make_synthetic_data(charades_cfg, seed=0, n_train=16, n_test=8)
    derived = Derived(num_words=dataset["n_words"], num_chars=dataset["n_chars"],
                      num_train_steps=4, steps_per_epoch=2)
    return dataset, store, derived


def test_linear_resample_align_corners_matches_torch():
    torch = pytest.importorskip("torch")
    x = np.random.default_rng(0).standard_normal((2, 17)).astype(np.float32)
    got = linear_resample_ac(x, 9)
    want = torch.nn.functional.interpolate(
        torch.tensor(x).unsqueeze(0), size=9, mode="linear", align_corners=True
    ).squeeze(0).numpy()
    np.testing.assert_allclose(got, want, atol=1e-6)


@pytest.mark.parametrize("name", ["OneTeacher", "OneTeacher_SoftLabel",
                                  "BaseFast_BAN_CoTrain", "MultiTeacher",
                                  "BaseFast_CCA_PreTrain"])
def test_distill_model_trains(name, charades_cfg, data):
    dataset, store, derived = data
    extra = None
    if name == "MultiTeacher":
        extra = {f"loss.t{i}_path": "" for i in range(3)}
        extra.update({f"loss.t{i}_cof": 1.0 for i in range(3)})
        extra.update({f"loss.t{i}_temperature": 3 for i in range(3)})
    cfg = _mk(charades_cfg, name, extra)
    entry = get_model_entry(name)
    batcher_cls = entry.batcher_cls or Batcher
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


def test_frozen_teacher_params_stay_fixed(charades_cfg, data):
    dataset, store, derived = data
    cfg = _mk(charades_cfg, "OneTeacher_SoftLabel")
    train_b = Batcher(dataset["train_set"], store, cfg, derived, "train")
    trainer = Trainer(cfg, derived, dataset["word_vector"])
    rng = jax.random.PRNGKey(0)
    state = trainer.init_state(rng, next(train_b.epoch(seed=0)))
    teacher_before = jax.tree_util.tree_map(np.asarray, state.params["teach_model"])
    student_before = np.asarray(jax.tree_util.tree_leaves(state.params["predictor"])[0]).copy()
    step = trainer.compiled_train_step()
    # two epochs = two optimizer steps: with the HF-exact float-warmup
    # schedule (see test_reference_trainer_parity) the FIRST step's lr is
    # exactly 0 (reference-faithful), so the student only moves on step 2
    for seed in (0, 1):
        for batch in train_b.epoch(seed=seed):
            state, _ = step(state, trainer._shard_batch(batch), rng)
    for before, after in zip(jax.tree_util.tree_leaves(teacher_before),
                             jax.tree_util.tree_leaves(state.params["teach_model"])):
        np.testing.assert_array_equal(np.asarray(before), np.asarray(after))
    student_after = np.asarray(jax.tree_util.tree_leaves(state.params["predictor"])[0])
    assert not np.allclose(student_before, student_after), "student must update"


def test_teacher_checkpoint_roundtrip(tmp_path, charades_cfg, data):
    """Train SeqPAN briefly, export its checkpoint + teacher labels, then
    boot OneTeacher_SoftLabel with that teacher checkpoint loaded."""
    dataset, store, derived = data
    from vmrframe_tpu.train.checkpoints import save_checkpoint
    from vmrframe_tpu.tools.export_labels import export_labels

    seqpan_trainer = Trainer(charades_cfg, derived, dataset["word_vector"])
    train_b = Batcher(dataset["train_set"], store, charades_cfg, derived, "train")
    rng = jax.random.PRNGKey(0)
    sp_state = seqpan_trainer.init_state(rng, next(train_b.epoch(seed=0)))
    ckpt = save_checkpoint(str(tmp_path), sp_state, name="best_SeqPAN")

    # teacher-label export (the scripts/generate_*_label.py replacement)
    out_pkl = str(tmp_path / "labels.pkl")
    labels = export_labels(charades_cfg, derived, dataset, store, sp_state,
                           seqpan_trainer, out_pkl)
    assert len(labels) == len(dataset["train_set"])
    with open(out_pkl, "rb") as f:
        stored = pickle.load(f)
    assert stored[0][1].shape[0] == 2

    cfg = _mk(charades_cfg, "OneTeacher_SoftLabel",
              {"teacher0.model.checkpoint": ckpt})
    trainer = Trainer(cfg, derived, dataset["word_vector"])
    state = trainer.init_state(jax.random.PRNGKey(1), next(train_b.epoch(seed=0)))
    # teacher weights must equal the loaded SeqPAN checkpoint
    a = jax.tree_util.tree_leaves(sp_state.params)[0]
    b = jax.tree_util.tree_leaves(state.params["teach_model"])[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    # MultiTeacher consumes the exported pickle
    mt_cfg = _mk(charades_cfg, "MultiTeacher",
                 {f"loss.t{i}_path": out_pkl for i in range(3)}
                 | {f"loss.t{i}_cof": 1.0 for i in range(3)}
                 | {f"loss.t{i}_temperature": 3 for i in range(3)})
    mt_b = MultiTeacherBatcher(dataset["train_set"], store, mt_cfg, derived, "train")
    batch = next(mt_b.epoch(seed=0, shuffle=False))
    assert batch["label1d_t0s"].shape[1:] == (2, charades_cfg.model.vlen)
    assert np.isfinite(batch["label1d_t0s"]).all()
