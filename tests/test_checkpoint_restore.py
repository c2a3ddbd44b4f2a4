"""restore_into_state robustness across optimizer-state layout changes.

Round 4 removed flat_adamw's 'decay' mask leaf from the optimizer state
(train/optim.py); a full checkpoint written before that change has one more
opt_state leaf than the live state.  The old positional-zip restore silently
fell back to FRESH optimizer state on the count mismatch — resuming such a
run reset Adam moments and restarted LR warmup with no error.  Dict states
are now key-matched (legacy leaves dropped loudly) and every not-restored
path logs a warning.
"""

import logging

import numpy as np
import pytest

from vmrframe_tpu.train import checkpoints as ckpt
from vmrframe_tpu.train.trainer import TrainState


def _mk_state(opt_state, step=0):
    params = {"w": np.zeros((4,), np.float32)}
    constants = {"word_vectors": np.zeros((2, 3), np.float32)}
    return TrainState(params, constants, opt_state, np.int32(step))


def _flat_opt(count, fill):
    return {
        "count": np.int32(count),
        "mu": np.full((4,), fill, np.float32),
        "nu": np.full((4,), fill * 2.0, np.float32),
    }


def test_restore_drops_legacy_decay_leaf(tmp_path, caplog):
    # a round-4-era flat_adamw checkpoint: {count, decay, mu, nu}
    legacy_opt = dict(_flat_opt(7, 2.0), decay=np.ones((4,), np.uint8))
    legacy = _mk_state(legacy_opt, step=7)
    legacy.params = {"w": np.full((4,), 5.0, np.float32)}
    path = ckpt.save_checkpoint(str(tmp_path), legacy, name="legacy", full=True)

    live = _mk_state(_flat_opt(0, 0.0))
    with caplog.at_level(logging.WARNING, logger="vmrframe_tpu.train.checkpoints"):
        restored = ckpt.restore_into_state(path, live)
    # moments and the schedule count come back — warmup does NOT restart
    assert set(restored.opt_state) == {"count", "mu", "nu"}
    assert int(restored.opt_state["count"]) == 7
    np.testing.assert_allclose(restored.opt_state["mu"], 2.0)
    np.testing.assert_allclose(restored.opt_state["nu"], 4.0)
    np.testing.assert_allclose(restored.params["w"], 5.0)
    assert "legacy leaves ['decay']" in caplog.text


def test_restore_same_layout_roundtrips_silently(tmp_path, caplog):
    state = _mk_state(_flat_opt(3, 1.5), step=3)
    path = ckpt.save_checkpoint(str(tmp_path), state, name="full", full=True)
    with caplog.at_level(logging.WARNING, logger="vmrframe_tpu.train.checkpoints"):
        restored = ckpt.restore_into_state(path, _mk_state(_flat_opt(0, 0.0)))
    assert int(restored.opt_state["count"]) == 3
    np.testing.assert_allclose(restored.opt_state["mu"], 1.5)
    ours = [r for r in caplog.records if r.name == "vmrframe_tpu.train.checkpoints"]
    assert ours == []


def test_restore_missing_leaf_warns_and_keeps_fresh(tmp_path, caplog):
    # checkpoint lacks a leaf the live state requires (e.g. a frozen-filter
    # 'keep' mask added later): keep fresh state, but say so loudly
    old = _mk_state(_flat_opt(9, 3.0), step=9)
    path = ckpt.save_checkpoint(str(tmp_path), old, name="old", full=True)
    live_opt = dict(_flat_opt(0, 0.0), keep=np.ones((4,), np.uint8))
    with caplog.at_level(logging.WARNING, logger="vmrframe_tpu.train.checkpoints"):
        restored = ckpt.restore_into_state(path, _mk_state(live_opt))
    assert int(restored.opt_state["count"]) == 0  # fresh
    assert "MISSING leaves ['keep']" in caplog.text


def test_restore_tuple_state_count_mismatch_warns(tmp_path, caplog):
    # non-dict (optax tree-chain) states still restore positionally; a leaf
    # count mismatch now warns instead of silently resetting
    old = _mk_state((np.int32(4), np.full((4,), 1.0, np.float32)), step=4)
    path = ckpt.save_checkpoint(str(tmp_path), old, name="tup", full=True)
    live = _mk_state((np.int32(0), np.zeros((4,), np.float32), np.zeros((4,), np.float32)))
    with caplog.at_level(logging.WARNING, logger="vmrframe_tpu.train.checkpoints"):
        restored = ckpt.restore_into_state(path, live)
    assert int(restored.opt_state[0]) == 0  # fresh
    assert "optimizer state not restored" in caplog.text
