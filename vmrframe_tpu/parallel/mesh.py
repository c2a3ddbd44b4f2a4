"""Device mesh + sharding helpers — the framework's parallelism layer.

The reference's entire distributed story is single-process nn.DataParallel
(main.py:22-24); here data parallelism is expressed through a
``jax.sharding.Mesh`` with NamedSharding:

- params/opt-state replicated, batches split on the ``data`` axis;
- XLA inserts the gradient all-reduce over ICI automatically inside the
  jitted train step (train/trainer.py);
- multi-host (DCN) scale-out goes through ``initialize_multihost`` +
  per-host batch slices.

TP/PP/EP axes are deliberately absent: every model in this zoo is ≤~60M
params (see SURVEY.md §2.10) — sharding them would spend ICI bandwidth to
save HBM nobody is short of.  The mesh helpers keep an optional second axis
available for the day that changes.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, axis_names: Tuple[str, ...] = ("data",),
              shape: Optional[Sequence[int]] = None) -> Mesh:
    """1D data mesh by default; pass shape/axis_names for a 2D layout."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    if shape is not None:
        devices = devices.reshape(shape)
    return Mesh(devices, axis_names=axis_names)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dimension over ``axis``."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> None:
    """Multi-host (DCN) initialization — jax.distributed with explicit args
    or env-based discovery.  Safe to call on single-host setups (no-op when
    no coordinator is configured)."""
    import os

    if coordinator_address is None and "JAX_COORDINATOR_ADDRESS" not in os.environ \
            and "COORDINATOR_ADDRESS" not in os.environ:
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes, process_id=process_id)


def local_batch_slice(global_batch_size: int) -> Tuple[int, int]:
    """(start, size) of this host's slice of a globally-sharded batch."""
    n = jax.process_count()
    idx = jax.process_index()
    per = global_batch_size // n
    return idx * per, per
