"""Checkpoint round-trip + eval determinism across the WHOLE model zoo.

Round 1 only exercised save→restore for SeqPAN-family states; this
parametrizes every structurally-distinct TrainState in the zoo (2D maps,
EMA extras, frozen-teacher trees, AF pyramid) through a full save →
fresh-init → restore → identical-eval cycle (reference behavior:
build_load_model + torch.save/load state_dict, main.py:26-33)."""

import os

import jax
import numpy as np
import pytest

from vmrframe_tpu.config import Derived, load_config
from vmrframe_tpu.data.batcher import Batcher
from vmrframe_tpu.registry import get_model_entry
from vmrframe_tpu.testing import make_synthetic_data
from vmrframe_tpu.train.checkpoints import restore_into_state, save_checkpoint
from vmrframe_tpu.train.trainer import Trainer

CONFIGS = os.path.join(os.path.dirname(__file__), "configs")


def _cfg_for(name, charades_cfg):
    if name == "BAN":
        return load_config(os.path.join(CONFIGS, "charades_ban.json"))
    if name == "CCA":
        return load_config(os.path.join(CONFIGS, "anet_cca.yaml"))
    if name == "ActionFormer":
        return load_config(os.path.join(CONFIGS, "charades_actionformer.yaml"))
    if name == "CPL":
        return charades_cfg.updated({
            "model.name": "CPL",
            "others": {"cpl_num_props": 4, "cpl_div_lambda": 0.15,
                       "cpl_div_loss_alhpa": 1.0},
        })
    if name in ("OneTeacher_SoftLabel", "MultiTeacher"):
        updates = {"model.name": name, "loss.temperature": 3,
                   "loss.sd": 1.0, "loss.t0": 1.0,
                   "teacher0.model": charades_cfg.model.to_dict()}
        if name == "MultiTeacher":
            updates.update({f"loss.t{i}_path": "" for i in range(3)})
            updates.update({f"loss.t{i}_cof": 1.0 for i in range(3)})
            updates.update({f"loss.t{i}_temperature": 3 for i in range(3)})
        return charades_cfg.updated(updates)
    return charades_cfg.updated({"model.name": name})


@pytest.mark.parametrize("name", [
    "SeqPAN", "BaseFast", "BackBone", "BackBoneAlignFeature",
    "BackBoneBertSentence", "BackBoneActionFormer", "BAN", "CCA",
    "ActionFormer", "CPL", "OneTeacher_SoftLabel", "MultiTeacher",
])
def test_checkpoint_roundtrip_identical_eval(name, charades_cfg, tmp_path):
    cfg = _cfg_for(name, charades_cfg)
    B = int(cfg.train.batch_size)
    dataset, store = make_synthetic_data(cfg, seed=0, n_train=B, n_test=B)
    derived = Derived(num_words=dataset["n_words"], num_chars=dataset["n_chars"],
                      num_train_steps=4, steps_per_epoch=1)
    entry = get_model_entry(cfg.model.name)
    batcher_cls = entry.batcher_cls or Batcher
    # sentence-variant batchers embed sentences at sentence_dim (default 768,
    # SBERT); the tiny test config is dim 32 and the L1 align head compares
    # the two directly (see tests/test_sentence_variants.py)
    orig_sentence_dim = getattr(batcher_cls, "sentence_dim", None)
    if orig_sentence_dim is not None:
        batcher_cls.sentence_dim = 32
        cfg = cfg.updated({"model.dim": 32})
    train_b = batcher_cls(dataset["train_set"], store, cfg, derived, "train")
    test_b = batcher_cls(dataset["test_set"], store, cfg, derived, "test")

    trainer = Trainer(cfg, derived, dataset["word_vector"])
    rng = jax.random.PRNGKey(0)
    state = trainer.init_state(rng, next(train_b.epoch(seed=0)))
    step = trainer.compiled_train_step()
    for batch in train_b.epoch(seed=0):
        state, m = step(state, trainer._shard_batch(batch), rng)
        assert np.isfinite(float(m["loss"]))
    ious_before, _, _ = trainer.run_eval_epoch(state, test_b.epoch(seed=0))

    path = save_checkpoint(str(tmp_path), state, name=f"best_{name}", full=True)

    # fresh process-equivalent: new trainer, newly-initialized state with a
    # DIFFERENT rng (so restore must actually overwrite every leaf)
    trainer2 = Trainer(cfg, derived, dataset["word_vector"])
    state2 = trainer2.init_state(jax.random.PRNGKey(1), next(train_b.epoch(seed=0)))
    state2 = restore_into_state(path, state2)
    ious_after, _, _ = trainer2.run_eval_epoch(state2, test_b.epoch(seed=0))
    np.testing.assert_allclose(ious_before, ious_after, atol=1e-6,
                               err_msg=f"{name}: eval changed across checkpoint roundtrip")
    # determinism of the restored state
    ious_again, _, _ = trainer2.run_eval_epoch(state2, test_b.epoch(seed=0))
    np.testing.assert_allclose(ious_after, ious_again, atol=1e-6)
    if orig_sentence_dim is not None:
        batcher_cls.sentence_dim = orig_sentence_dim
