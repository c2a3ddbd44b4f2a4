"""Pallas TPU kernels for the hot attention ops.

Targets (BASELINE.json north star): SeqPAN's DualMultiAttention — two
softmax attentions sharing one Q (models/layers.py:336-381 in the
reference) — and the generic masked MHA used across the zoo.

At VMR sequence lengths (L ≤ 256) the whole (L, L) score tile fits VMEM, so
each grid program computes one (batch, head) slice start-to-finish: scores,
additive mask, stable softmax, and the value matmul never touch HBM.  The
dual kernel additionally reuses the Q tile for both the self and the cross
branch — the fusion the reference leaves on the table.

All kernels fall back to plain jnp on non-TPU backends (CPU tests run the
same code path via interpret=True in the unit tests).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pallas TPU backend is only importable with a TPU-capable jaxlib
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False


def pallas_supported() -> bool:
    if not _HAS_PLTPU:
        return False
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


# ------------------------------------------------------------------ kernels


def _attn_kernel(q_ref, k_ref, v_ref, mask_ref, out_ref, *, scale):
    """One (batch·head) slice: out = softmax(q kᵀ·scale + (1-mask)·-1e30) v."""
    q = q_ref[0]  # (Lq, hd)
    k = k_ref[0]  # (Lk, hd)
    v = v_ref[0]
    mask = mask_ref[0]  # (Lq, Lk) float {0,1}
    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    scores = scores + (1.0 - mask) * -1e30
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    out_ref[0] = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(out_ref.dtype)


def fused_masked_attention(q, k, v, mask, *, interpret: bool = False):
    """softmax(q kᵀ/√hd masked) v over (B, H, L, hd) tensors.

    mask: (B, Lq, Lk) float {0,1}, shared across heads.
    """
    B, H, Lq, hd = q.shape
    Lk = k.shape[2]
    scale = 1.0 / math.sqrt(hd)
    qf = q.reshape(B * H, Lq, hd)
    kf = k.reshape(B * H, Lk, hd)
    vf = v.reshape(B * H, Lk, hd)
    maskf = jnp.repeat(mask, H, axis=0)  # (B*H, Lq, Lk)

    grid = (B * H,)
    blk = lambda L, d: pl.BlockSpec((1, L, d), lambda i: (i, 0, 0))
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((B * H, Lq, hd), q.dtype),
        grid=grid,
        in_specs=[blk(Lq, hd), blk(Lk, hd), blk(Lk, hd), blk(Lq, Lk)],
        out_specs=blk(Lq, hd),
        interpret=interpret,
    )(qf, kf, vf, maskf)
    return out.reshape(B, H, Lq, hd)


def _dual_attn_kernel(q_ref, fk_ref, fv_ref, tk_ref, tv_ref, smask_ref, xmask_ref,
                      s_out_ref, x_out_ref, *, scale):
    """Shared-Q dual attention: self branch over (fk, fv), cross branch over
    (tk, tv) — Q loaded once, both score tiles live in VMEM."""
    q = q_ref[0]

    def branch(k_ref, v_ref, m_ref, o_ref):
        k = k_ref[0]
        v = v_ref[0]
        mask = m_ref[0]
        scores = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        scores = scores + (1.0 - mask) * -1e30
        mx = jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.exp(scores - mx)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        o_ref[0] = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ).astype(o_ref.dtype)

    branch(fk_ref, fv_ref, smask_ref, s_out_ref)
    branch(tk_ref, tv_ref, xmask_ref, x_out_ref)


def fused_dual_attention(q, f_k, f_v, t_k, t_v, s_mask, x_mask, *, interpret: bool = False):
    """SeqPAN's dual attention core: (s_value, x_value), both (B, H, L, hd).

    q/f_k/f_v: (B, H, L, hd); t_k/t_v: (B, H, M, hd);
    s_mask: (B, L, L); x_mask: (B, L, M) — float {0,1}.
    """
    B, H, L, hd = q.shape
    M = t_k.shape[2]
    scale = 1.0 / math.sqrt(hd)
    flat = lambda x: x.reshape(B * H, x.shape[2], x.shape[3])
    rep = lambda m: jnp.repeat(m, H, axis=0)

    grid = (B * H,)
    blk = lambda a, b: pl.BlockSpec((1, a, b), lambda i: (i, 0, 0))
    s_out, x_out = pl.pallas_call(
        functools.partial(_dual_attn_kernel, scale=scale),
        out_shape=(
            jax.ShapeDtypeStruct((B * H, L, hd), q.dtype),
            jax.ShapeDtypeStruct((B * H, L, hd), q.dtype),
        ),
        grid=grid,
        in_specs=[blk(L, hd), blk(L, hd), blk(L, hd), blk(M, hd), blk(M, hd),
                  blk(L, L), blk(L, M)],
        out_specs=(blk(L, hd), blk(L, hd)),
        interpret=interpret,
    )(flat(q), flat(f_k), flat(f_v), flat(t_k), flat(t_v), rep(s_mask), rep(x_mask))
    return s_out.reshape(B, H, L, hd), x_out.reshape(B, H, L, hd)
