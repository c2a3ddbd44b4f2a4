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


def _cq_kernel(c_ref, q_ref, w4c_ref, w4q_ref, w4m_ref, cm_ref, qm_ref,
               c2q_ref, q2c_ref):
    """QANet context-query attention core (reference models/layers.py:402-437):
    trilinear score + both masked softmaxes + the two value matmuls, one
    batch element per program, score tile never leaves VMEM."""
    c = c_ref[0]  # (Lc, D)
    q = q_ref[0]  # (Lq, D)
    w4c = w4c_ref[:]  # (D, 1)
    w4q = w4q_ref[:]
    w4m = w4m_ref[0]  # (1, D)
    cmask = cm_ref[0]  # (1, Lc)
    qmask = qm_ref[0]  # (1, Lq)

    s0 = jax.lax.dot_general(c, w4c, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)  # (Lc, 1)
    s1 = jax.lax.dot_general(q, w4q, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)  # (Lq, 1)
    s2 = jax.lax.dot_general(c * w4m, q, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)  # (Lc, Lq)
    score = s2 + s0 + s1.reshape(1, -1)

    row = score + (1.0 - qmask) * -1e30  # mask query columns
    row = row - jnp.max(row, axis=1, keepdims=True)
    e_r = jnp.exp(row)
    s_ = e_r / jnp.sum(e_r, axis=1, keepdims=True)  # (Lc, Lq) softmax over Lq

    col = score + (1.0 - cmask.reshape(-1, 1)) * -1e30  # mask context rows
    col = col - jnp.max(col, axis=0, keepdims=True)
    e_c = jnp.exp(col)
    s_t = e_c / jnp.sum(e_c, axis=0, keepdims=True)  # (Lc, Lq) softmax over Lc

    c2q_ref[0] = jax.lax.dot_general(
        s_.astype(q.dtype), q, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(c2q_ref.dtype)
    # q2c = S_ @ (S_tᵀ @ c): associate the cheap way (Lc·Lq·D twice instead
    # of the reference's (S_ @ S_tᵀ) @ c at Lc·Lq·Lc)
    stc = jax.lax.dot_general(s_t.astype(c.dtype), c, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)  # (Lq, D)
    q2c_ref[0] = jax.lax.dot_general(
        s_.astype(stc.dtype), stc, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(q2c_ref.dtype)


def fused_cq_attention(context, query, w4C, w4Q, w4mlu, c_mask, q_mask, *,
                       interpret: bool = False):
    """(c2q, q2c), both (B, Lc, D) — the two attention outputs CQAttention
    concatenates.  Forward-only (no custom VJP yet): callers use it on the
    deterministic eval path."""
    B, Lc, D = context.shape
    Lq = query.shape[1]
    grid = (B,)
    blk = lambda a, b: pl.BlockSpec((1, a, b), lambda i: (i, 0, 0))
    wspec = pl.BlockSpec((D, 1), lambda i: (0, 0))
    mspec = pl.BlockSpec((1, 1, D), lambda i: (0, 0, 0))
    c2q, q2c = pl.pallas_call(
        _cq_kernel,
        out_shape=(jax.ShapeDtypeStruct((B, Lc, D), context.dtype),
                   jax.ShapeDtypeStruct((B, Lc, D), context.dtype)),
        grid=grid,
        in_specs=[blk(Lc, D), blk(Lq, D), wspec, wspec, mspec,
                  pl.BlockSpec((1, 1, Lc), lambda i: (i, 0, 0)),
                  pl.BlockSpec((1, 1, Lq), lambda i: (i, 0, 0))],
        out_specs=(blk(Lc, D), blk(Lc, D)),
        interpret=interpret,
    )(context, query, w4C, w4Q, w4mlu,
      c_mask[:, None, :], q_mask[:, None, :])
    return c2q, q2c


# --------------------------------------------------------------- autodiff ---
# The fused kernels are forward-only Pallas; wrapping them in custom_vjp with
# an XLA-recompute backward makes them safe to call under jax.grad (training
# falls back to XLA math for the backward — same FLOPs as not fusing).

def _dual_reference(q, f_k, f_v, t_k, t_v, s_mask, x_mask):
    hd = q.shape[-1]
    scale = 1.0 / math.sqrt(hd)
    s_scores = jnp.einsum("bhld,bhmd->bhlm", q, f_k) * scale
    s_scores = s_scores + (1.0 - s_mask[:, None]) * -1e30
    s_p = jax.nn.softmax(s_scores, axis=-1)
    x_scores = jnp.einsum("bhld,bhmd->bhlm", q, t_k) * scale
    x_scores = x_scores + (1.0 - x_mask[:, None]) * -1e30
    x_p = jax.nn.softmax(x_scores, axis=-1)
    return (jnp.einsum("bhlm,bhmd->bhld", s_p, f_v),
            jnp.einsum("bhlm,bhmd->bhld", x_p, t_v))


@jax.custom_vjp
def fused_dual_attention_ad(q, f_k, f_v, t_k, t_v, s_mask, x_mask):
    return fused_dual_attention(q, f_k, f_v, t_k, t_v, s_mask, x_mask)


def _dual_fwd(q, f_k, f_v, t_k, t_v, s_mask, x_mask):
    return fused_dual_attention(q, f_k, f_v, t_k, t_v, s_mask, x_mask), \
        (q, f_k, f_v, t_k, t_v, s_mask, x_mask)


def _dual_bwd(res, g):
    _, vjp = jax.vjp(_dual_reference, *res)
    grads = vjp(g)
    return grads[:5] + (None, None)


fused_dual_attention_ad.defvjp(_dual_fwd, _dual_bwd)


def _cq_reference(context, query, w4C, w4Q, w4mlu, c_mask, q_mask):
    s0 = jnp.matmul(context, w4C)
    s1 = jnp.matmul(query, w4Q).transpose(0, 2, 1)
    s2 = jnp.einsum("bld,bmd->blm", context * w4mlu[0], query)
    score = s0 + s1 + s2
    s_ = jax.nn.softmax(score + (1.0 - q_mask[:, None, :]) * -1e30, axis=2)
    s_t = jax.nn.softmax(score + (1.0 - c_mask[:, :, None]) * -1e30, axis=1).transpose(0, 2, 1)
    c2q = jnp.matmul(s_, query)
    q2c = jnp.matmul(jnp.matmul(s_, s_t), context)
    return c2q, q2c


@jax.custom_vjp
def fused_cq_attention_ad(context, query, w4C, w4Q, w4mlu, c_mask, q_mask):
    return fused_cq_attention(context, query, w4C, w4Q, w4mlu, c_mask, q_mask)


def _cq_fwd(context, query, w4C, w4Q, w4mlu, c_mask, q_mask):
    return fused_cq_attention(context, query, w4C, w4Q, w4mlu, c_mask, q_mask), \
        (context, query, w4C, w4Q, w4mlu, c_mask, q_mask)


def _cq_bwd(res, g):
    _, vjp = jax.vjp(_cq_reference, *res)
    grads = vjp(g)
    return grads[:5] + (None, None)


fused_cq_attention_ad.defvjp(_cq_fwd, _cq_bwd)
