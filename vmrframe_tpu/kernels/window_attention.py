"""Blocked sliding-window (banded) attention — the Pallas kernel for the
long-sequence regime.

The reference implements Longformer-style windowed attention with as_strided
chunk tricks (reference models/ActionFormerlib/blocks.py:309-641); our XLA
path (layers/actionformer.py::MaskedMHCA) computes the FULL (T, T) score
matrix and band-masks it — exact, simple, and fine up to a few hundred
frames, but O(T²·hd) FLOPs and O(T²) HBM traffic where the band only needs
O(T·w).  This kernel computes each 128-row query tile against only the
K_WINDOW keys that can fall inside the band, so FLOPs scale with T·K_WINDOW:
at T = 2304, window 19, that is ~6× fewer score FLOPs and no (T, T)
materialization.

Forward AND backward are Pallas (flash-style recompute):
- forward: grid (B·H, T/TILE_Q); per tile: scores → band+kv mask → stable
  softmax → value matmul, all in VMEM;
- backward dq: same grid, recompute p, dq = (p ∘ (dp − rowsum(dp·p)))·scale @ k;
- backward dk/dv: the band is symmetric, so a second pass gridded over KEY
  tiles recomputes the transposed problem and writes dk, dv without any
  cross-program accumulation.

Rel-PE is NOT supported here (shipped configs set use_rel_pe false,
config/charades/ActionFormer.yaml:70); callers fall back to the XLA path.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from vmrframe_tpu.kernels.attention import pallas_supported  # noqa: F401

TILE = 128
NEG = -1e30


def _fwd_kernel(q_ref, k_ref, v_ref, m_ref, o_ref, *, scale, half, T, K_WIN):
    i = pl.program_id(1)
    q_start = i * TILE
    start = pl.multiple_of(jnp.clip(q_start - (K_WIN - TILE) // 2, 0, T - K_WIN), TILE)
    q = q_ref[0]  # (TILE, hd)
    k = k_ref[0, pl.ds(start, K_WIN), :]  # (K_WIN, hd)
    v = v_ref[0, pl.ds(start, K_WIN), :]
    kvm = m_ref[0, :, pl.ds(start, K_WIN)]  # (1, K_WIN)
    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32) * scale
    qi = q_start + jax.lax.broadcasted_iota(jnp.int32, (TILE, K_WIN), 0)
    kj = start + jax.lax.broadcasted_iota(jnp.int32, (TILE, K_WIN), 1)
    ok = (jnp.abs(qi - kj) <= half) & (kvm > 0)
    scores = jnp.where(ok, scores, NEG)
    mx = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - mx)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    o_ref[0] = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _dq_kernel(q_ref, k_ref, v_ref, m_ref, g_ref, dq_ref, *, scale, half, T, K_WIN):
    i = pl.program_id(1)
    q_start = i * TILE
    start = pl.multiple_of(jnp.clip(q_start - (K_WIN - TILE) // 2, 0, T - K_WIN), TILE)
    q = q_ref[0]
    k = k_ref[0, pl.ds(start, K_WIN), :]
    v = v_ref[0, pl.ds(start, K_WIN), :]
    kvm = m_ref[0, :, pl.ds(start, K_WIN)]
    g = g_ref[0]  # (TILE, hd)
    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32) * scale
    qi = q_start + jax.lax.broadcasted_iota(jnp.int32, (TILE, K_WIN), 0)
    kj = start + jax.lax.broadcasted_iota(jnp.int32, (TILE, K_WIN), 1)
    ok = (jnp.abs(qi - kj) <= half) & (kvm > 0)
    scores = jnp.where(ok, scores, NEG)
    mx = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - mx)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    dp = jax.lax.dot_general(
        g, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)  # (TILE, K_WIN)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True)) * scale
    dq_ref[0] = jax.lax.dot_general(
        ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dq_ref.dtype)


def _dkv_kernel(q_ref, k_ref, v_ref, m_ref, g_ref, dk_ref, dv_ref, *, scale, half, T, K_WIN):
    """Grid over KEY tiles: each program owns dk/dv for its 128 keys and
    recomputes the softmax for the query window that can reach them."""
    j = pl.program_id(1)
    k_start = j * TILE
    start = pl.multiple_of(jnp.clip(k_start - (K_WIN - TILE) // 2, 0, T - K_WIN), TILE)  # query window
    k = k_ref[0, pl.ds(k_start, TILE), :]  # (TILE, hd) keys owned
    v = v_ref[0, pl.ds(k_start, TILE), :]
    q = q_ref[0, pl.ds(start, K_WIN), :]  # (K_WIN, hd) queries that reach them
    g = g_ref[0, pl.ds(start, K_WIN), :]
    kvm_own = m_ref[0, :, pl.ds(k_start, TILE)]  # (1, TILE) own keys' validity

    # scores of window queries vs owned keys
    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32) * scale
    qi = start + jax.lax.broadcasted_iota(jnp.int32, (K_WIN, TILE), 0)
    kj = k_start + jax.lax.broadcasted_iota(jnp.int32, (K_WIN, TILE), 1)
    ok = (jnp.abs(qi - kj) <= half) & (kvm_own > 0)
    scores = jnp.where(ok, scores, NEG)

    # normalizers: each window query attends over keys in ITS window — which
    # may extend beyond the owned tile.  Recompute against the full key slice
    # covering [start - half, start + K_WIN + half), clipped; K_WIN + 2*half
    # <= K_WIN + (K_WIN - TILE) so a K2 = 2*K_WIN - TILE slice always covers
    # (clamped to T when the sequence is barely longer than one window).
    K2 = min(2 * K_WIN - TILE, T)
    n_start = pl.multiple_of(jnp.clip(start - (K_WIN - TILE) // 2, 0, T - K2), TILE)
    k_full = k_ref[0, pl.ds(n_start, K2), :]
    kvm_full = m_ref[0, :, pl.ds(n_start, K2)]
    s_full = jax.lax.dot_general(
        q, k_full, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32) * scale
    qi2 = start + jax.lax.broadcasted_iota(jnp.int32, (K_WIN, K2), 0)
    kj2 = n_start + jax.lax.broadcasted_iota(jnp.int32, (K_WIN, K2), 1)
    ok2 = (jnp.abs(qi2 - kj2) <= half) & (kvm_full > 0)
    s_full = jnp.where(ok2, s_full, NEG)
    mx = jnp.max(s_full, axis=-1, keepdims=True)
    denom = jnp.sum(jnp.exp(s_full - mx), axis=-1, keepdims=True)

    p = jnp.exp(scores - mx) / denom  # (K_WIN, TILE) probs onto owned keys
    # dv = pᵀ g
    dv_ref[0] = jax.lax.dot_general(
        p.astype(g.dtype), g, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dv_ref.dtype)
    # ds = p ∘ (dp − rowsum(dp·p_full));  rowsum recomputed via full window
    dp = jax.lax.dot_general(
        g, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)  # (K_WIN, TILE)
    v_full = v_ref[0, pl.ds(n_start, K2), :]
    dp_full = jax.lax.dot_general(
        g, v_full, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    p_full = jnp.exp(s_full - mx) / denom
    row = jnp.sum(dp_full * p_full, axis=-1, keepdims=True)
    ds = p * (dp - row) * scale  # (K_WIN, TILE)
    dk_ref[0] = jax.lax.dot_general(
        ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dk_ref.dtype)


def _pad_to(x, T_pad, axis=1):
    pad = T_pad - x.shape[axis]
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _specs(BH, T, hd, K_WIN):
    qspec = pl.BlockSpec((1, TILE, hd), lambda b, i: (b, i, 0))
    full = pl.BlockSpec((1, T, hd), lambda b, i: (b, 0, 0))
    mspec = pl.BlockSpec((1, 1, T), lambda b, i: (b, 0, 0))
    return qspec, full, mspec


def _fwd(q, k, v, kv_mask, window, interpret=False):
    BH, T, hd = q.shape
    half = window // 2
    K_WIN = TILE + 2 * ((half + TILE - 1) // TILE) * TILE
    grid = (BH, T // TILE)
    qspec, full, mspec = _specs(BH, T, hd, K_WIN)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, scale=1.0 / math.sqrt(hd), half=half, T=T, K_WIN=K_WIN),
        out_shape=jax.ShapeDtypeStruct((BH, T, hd), q.dtype),
        grid=grid,
        in_specs=[qspec, full, full, mspec],
        out_specs=qspec,
        interpret=interpret,
    )(q, k, v, kv_mask)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _banded(q, k, v, kv_mask, window, interpret):
    return _fwd(q, k, v, kv_mask, window, interpret)


def _banded_fwd(q, k, v, kv_mask, window, interpret):
    return _fwd(q, k, v, kv_mask, window, interpret), (q, k, v, kv_mask)


def _banded_bwd(window, interpret, res, g):
    q, k, v, kv_mask = res
    BH, T, hd = q.shape
    half = window // 2
    K_WIN = TILE + 2 * ((half + TILE - 1) // TILE) * TILE
    grid = (BH, T // TILE)
    qspec, full, mspec = _specs(BH, T, hd, K_WIN)
    scale = 1.0 / math.sqrt(hd)
    dq = pl.pallas_call(
        functools.partial(_dq_kernel, scale=scale, half=half, T=T, K_WIN=K_WIN),
        out_shape=jax.ShapeDtypeStruct((BH, T, hd), q.dtype),
        grid=grid,
        in_specs=[qspec, full, full, mspec, qspec],
        out_specs=qspec,
        interpret=interpret,
    )(q, k, v, kv_mask, g)
    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, scale=scale, half=half, T=T, K_WIN=K_WIN),
        out_shape=(jax.ShapeDtypeStruct((BH, T, hd), q.dtype),
                   jax.ShapeDtypeStruct((BH, T, hd), q.dtype)),
        grid=grid,
        in_specs=[full, full, full, mspec, full],
        out_specs=(qspec, qspec),
        interpret=interpret,
    )(q, k, v, kv_mask, g)
    return dq, dk, dv, None


_banded.defvjp(_banded_fwd, _banded_bwd)


def banded_attention(q, k, v, kv_mask, window: int, *, interpret: bool = False):
    """softmax over the |i-j| <= window//2 band, invalid keys masked.

    q/k/v: (B, H, T, hd); kv_mask: (B, T) float {0,1}.  Returns (B, H, T, hd).
    T is padded internally to a multiple of 128 (pad keys masked out).
    Exact same math as the XLA band-mask path for valid queries; padded /
    all-masked query rows return the uniform average of the window slice —
    callers multiply by the query mask (as MaskedMHCA already does).
    """
    B, H, T, hd = q.shape
    T_pad = ((T + TILE - 1) // TILE) * TILE
    half = window // 2
    K_WIN = TILE + 2 * ((half + TILE - 1) // TILE) * TILE
    if T_pad < K_WIN:
        raise ValueError(f"T={T} too small for banded kernel (needs >= {K_WIN})")
    flat = lambda x: _pad_to(x.reshape(B * H, T, hd), T_pad)
    maskf = _pad_to(jnp.repeat(kv_mask[:, None, :], H, axis=0).reshape(B * H, 1, T), T_pad, axis=2)
    out = _banded(flat(q), flat(k), flat(v), maskf, window, interpret)
    return out[:, :T, :].reshape(B, H, T, hd)
