"""Span inference ops — the reference's utils/engine.py on device.

``infer_span_1d`` reproduces infer_basic (engine.py:28-44): masked softmax of
start/end logits, outer product, upper-triangular restriction, row/col argmax,
then fractional spans dividing by the number of VALID frames (vmask.sum, not
L — a subtle protocol detail, engine.py:41-42).

``infer_span_2d`` reproduces infer_basic2d (engine.py:49-59) for 2D
proposal-map models (BAN/CCA).

Everything is jit-friendly: static shapes, no host sync.  The (L, L) outer
product at L≤256 is a single small MXU matmul per sample — XLA fuses the
triu mask and the two max-reductions into it.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vmrframe_tpu.ops.masking import mask_logits


def _triu_argmax_rowcol(outer: jnp.ndarray):
    """Given (B, L, L) scores restricted to s<=e, return (start_idx, end_idx).

    Mirrors torch: max over dim2 then argmax over dim1 for start; max over
    dim1 then argmax over dim1 for end (engine.py:37-39).
    """
    L = outer.shape[-1]
    triu = jnp.triu(jnp.ones((L, L), dtype=bool))
    outer = jnp.where(triu[None, :, :], outer, 0.0)
    start_idx = jnp.argmax(jnp.max(outer, axis=2), axis=1)
    end_idx = jnp.argmax(jnp.max(outer, axis=1), axis=1)
    return start_idx, end_idx


def infer_span_1d(start_logits: jnp.ndarray, end_logits: jnp.ndarray, vmask: jnp.ndarray) -> jnp.ndarray:
    """(B, L) start/end logits + (B, L) mask -> (B, 2) fractional spans."""
    start_prob = jax.nn.softmax(mask_logits(start_logits, vmask), axis=1)
    end_prob = jax.nn.softmax(mask_logits(end_logits, vmask), axis=1)
    outer = start_prob[:, :, None] * end_prob[:, None, :]
    start_idx, end_idx = _triu_argmax_rowcol(outer)
    denom = jnp.sum(vmask, axis=1)
    sfrac = start_idx.astype(jnp.float32) / denom
    efrac = end_idx.astype(jnp.float32) / denom
    return jnp.stack([sfrac, efrac], axis=1)


def infer_span_2d(scores2d: jnp.ndarray, mask2d: jnp.ndarray, vmask: jnp.ndarray) -> jnp.ndarray:
    """(B, L, L) proposal scores + (L, L) validity mask -> (B, 2) fractions."""
    scores = jax.nn.sigmoid(scores2d) * mask2d.astype(scores2d.dtype)
    start_idx, end_idx = _triu_argmax_rowcol(scores)
    denom = jnp.sum(vmask, axis=1)
    sfrac = start_idx.astype(jnp.float32) / denom
    efrac = end_idx.astype(jnp.float32) / denom
    return jnp.stack([sfrac, efrac], axis=1)
