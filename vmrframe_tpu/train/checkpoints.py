"""Checkpointing via orbax.

Replaces the reference's ``torch.save(model.state_dict())`` best-model scheme
(utils/utils.py:208-215, main.py:26-28) with orbax pytree checkpoints that
hold params, the frozen constants (GloVe), optimizer state and step — so both
"best model" export and full resume work.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def _to_save(state, full: bool = True):
    payload = {"params": state.params, "constants": state.constants, "step": state.step}
    if full:
        payload["opt_state"] = state.opt_state
    return payload


def save_checkpoint(ckpt_dir: str, state, name: str = "best", full: bool = False) -> str:
    path = os.path.abspath(os.path.join(ckpt_dir, name))
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, _to_save(state, full=full), force=True)
    ckptr.wait_until_finished()
    return path


def load_checkpoint(path: str):
    """Load a checkpoint as plain numpy pytrees (no sharding assumptions)."""
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path))


def restore_into_state(path: str, state):
    """Restore params/constants (and opt_state/step when present) into an
    existing TrainState built by Trainer.init_state."""
    restored = load_checkpoint(path)
    from vmrframe_tpu.train.trainer import TrainState

    params = jax.tree_util.tree_map(lambda o, n: np.asarray(n, o.dtype), state.params, restored["params"])
    constants = jax.tree_util.tree_map(
        lambda o, n: np.asarray(n, o.dtype), state.constants, restored["constants"]
    )
    opt_state = state.opt_state
    if restored.get("opt_state") is not None:
        # orbax round-trips optax states as plain containers; rebuild through
        # the live treedef so NamedTuple/custom nodes come back intact
        target_leaves, treedef = jax.tree_util.tree_flatten(state.opt_state)
        restored_leaves = jax.tree_util.tree_leaves(restored["opt_state"])
        if len(restored_leaves) == len(target_leaves):
            leaves = [np.asarray(n, getattr(o, "dtype", None)) if hasattr(o, "dtype") else n
                      for o, n in zip(target_leaves, restored_leaves)]
            opt_state = jax.tree_util.tree_unflatten(treedef, leaves)
    step = restored.get("step", state.step)
    return TrainState(params, constants, opt_state, step, state.extras)
