"""BaseFast_BAN_PreTrain: student + frozen BAN teacher on the same batch."""

import os

import jax
import numpy as np
import pytest

from vmrframe_tpu.config import Derived, load_config
from vmrframe_tpu.data.batcher import Batcher
from vmrframe_tpu.testing import make_synthetic_data
from vmrframe_tpu.train.trainer import Trainer


def test_basefast_ban_pretrain_trains(charades_cfg):
    ban_cfg = load_config(os.path.join(os.path.dirname(__file__), "configs", "charades_ban.json"))
    # student config (SeqPAN-style dims) + BAN teacher0 at the student's vlen
    teacher_model = dict(ban_cfg.model.to_dict(), vlen=charades_cfg.model.vlen,
                         vdim=charades_cfg.model.vdim, name="BAN")
    cfg = charades_cfg.updated({
        "model.name": "BaseFast_BAN_PreTrain",
        "loss.temperature": 3,
        "teacher0.model": teacher_model,
        "gcn": ban_cfg.gcn.to_dict(),
    })
    dataset, store = make_synthetic_data(cfg, seed=0, n_train=16, n_test=8)
    derived = Derived(num_words=dataset["n_words"], num_chars=dataset["n_chars"],
                      num_train_steps=2, steps_per_epoch=2)
    train_b = Batcher(dataset["train_set"], store, cfg, derived, "train")
    trainer = Trainer(cfg, derived, dataset["word_vector"])
    rng = jax.random.PRNGKey(0)
    state = trainer.init_state(rng, next(train_b.epoch(seed=0)))
    step = trainer.compiled_train_step()
    teacher_before = np.asarray(jax.tree_util.tree_leaves(state.params["teach_model"])[0]).copy()
    batch = next(train_b.epoch(seed=0))
    state, m = step(state, trainer._shard_batch(batch), rng)
    assert np.isfinite(float(m["loss"]))
    teacher_after = np.asarray(jax.tree_util.tree_leaves(state.params["teach_model"])[0])
    np.testing.assert_array_equal(teacher_before, teacher_after)
