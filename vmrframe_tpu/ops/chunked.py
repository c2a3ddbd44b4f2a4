"""Chunked large-batch evaluation.

Measured on v5e (docs/ROOFLINE.json, docs/PROFILE_BATCH.json): the SeqPAN
eval step's XLA fusion granularity COLLAPSES between B=256 and B=512 — the
same program compiles to 866 kernels / 2.9 GB of inter-kernel HBM traffic at
B=256 but 1352 kernels / 8.2 GB at B=512 (scoped-VMEM limits split the big
fusions; raising ``xla_tpu_scoped_vmem_limit_kib`` via compiler options was
measured NOT to help).  Per-query throughput therefore FALLS 152k -> 126k ->
92k as batch grows 128 -> 512 -> 1024.

The fix is to keep XLA in its good regime: run the forward as a
``lax.map`` over fixed-size chunks inside one jit.  Each chunk executes the
compact B<=256 kernel schedule; throughput becomes monotone (flat) in batch
size instead of regressing.  This is the classic serving "max micro-batch"
tile — the chunk size is a compile-time constant, so there is exactly one
compiled program regardless of how large the offline batch is.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def chunked_batch_apply(fn, batch: dict, batch_size: int, chunk: int = 256,
                        unroll: bool = True):
    """Apply ``fn`` (dict-batch -> pytree) in ``chunk``-sized slices over the
    leading axis, concatenating results.

    - arrays whose leading dim == batch_size are sliced; everything else is
      broadcast to every chunk unchanged;
    - ``batch_size`` must be divisible by ``chunk`` (static shapes — callers
      pad the tail batch, as every batcher here already does);
    - with ``batch_size <= chunk`` this is exactly ``fn(batch)``.

    ``unroll=True`` (default) emits the chunks as a Python loop over STATIC
    slices inside the jit: each chunk keeps the compact B<=chunk kernel
    schedule and XLA schedules them back-to-back with static offsets —
    no scan carry, no dynamic-slice/dynamic-update-slice copies of the
    inputs/outputs per iteration.  ``unroll=False`` uses ``lax.map``
    (one compiled body regardless of n — compile-time bound for very
    large n; measured ~25% slower per query at B=512/chunk=256 than the
    unrolled form because of the scan's stacking copies)."""
    if batch_size <= chunk:
        return fn(batch)
    assert batch_size % chunk == 0, (batch_size, chunk)
    n = batch_size // chunk

    sliced = {k: v for k, v in batch.items()
              if hasattr(v, "ndim") and v.ndim >= 1 and v.shape[0] == batch_size}
    static = {k: v for k, v in batch.items() if k not in sliced}

    if unroll:
        outs = [fn({**static,
                    **{k: v[i * chunk:(i + 1) * chunk] for k, v in sliced.items()}})
                for i in range(n)]
        return jax.tree_util.tree_map(
            lambda *xs: jnp.concatenate(xs, axis=0), *outs)

    stacked = {k: v.reshape((n, chunk) + v.shape[1:]) for k, v in sliced.items()}

    def one(part):
        return fn({**static, **part})

    out = jax.lax.map(one, stacked)
    return jax.tree_util.tree_map(
        lambda x: x.reshape((x.shape[0] * x.shape[1],) + x.shape[2:]), out)
