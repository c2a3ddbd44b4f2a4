"""Fused 2-layer dual-attention stack — the whole-block Pallas kernel for
SeqPAN-family EVAL.

Why: at Charades dims (B=128, L=64, D=128) the four DualAttentionBlock calls
are 52% of the 0.85 ms eval step (docs/PROFILE_SEQPAN.json) and the XLA path
is HBM-bound: every one of ~15 matmul boundaries per block materializes a
(B, L, D) activation.  This kernel runs the ENTIRE stack —
v1 = dab1(v, t); t1 = dab1(t, v); v2 = dab2(v1, t1); t2 = dab2(t1, v1)
(models/common.py, reference models/SeqPAN.py:66-71) — for two samples per
grid program with every activation resident in VMEM; HBM traffic drops to
inputs + outputs + one pass over the weights.

TPU-shape decisions (the whole point of the design):
- two samples stacked on sublanes => every matmul is (>=64, 128) @ (128, *)
  — full MXU tiles, no sub-128 row waste at L=64;
- NO per-head lane slicing (Mosaic relayouts): per-head attention uses
  lane-masked operands — scores_h = q @ (kT ⊙ head_mask), and the merged
  context accumulates p_h @ (v ⊙ head_mask), which lands each head's output
  exactly in its own lane block.  4x score FLOPs at full MXU utilization
  beats exact FLOPs through relayouts at these sizes;
- cross-sample attention is forbidden by a block-diagonal additive mask
  (iota row//L == col//L), which also carries the reference's -1e30 key
  validity masking (ops/masking.py semantics, reference models/layers.py:9-12).

Eval-only (no dropout): the train path keeps the XLA formulation.  Math is
EXACTLY the XLA path's (same masking, same stable softmax, f32 accumulation)
up to float reassociation; tests/test_dual_stack.py pins both paths together
in interpret mode.

VERDICT (measured, v5e, Charades dims B=128/L=64/D=128/H=4, bf16): the
kernel runs the stack in 0.66 ms vs 0.29 ms for the XLA module path —
PARKED opt-in (``model.fused_dual_stack: true``), default off.  XLA's
batched matmuls already sustain ~60 TFLOP/s effective on this workload; the
kernel's ~140 small sequential dots per 2-sample program pay ~60 ns/op of
issue overhead that swamps the saved HBM traffic.  The premise (activations
VMEM-resident across the whole stack) is sound for LARGER D·L — revisit if
a config with D >= 512 or L >= 512 ships for this family.  The
parameter-collector half (DualAttentionBlockParams) is load-bearing either
way: it proves the two code paths share one checkpoint tree.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from vmrframe_tpu.kernels.attention import pallas_supported  # noqa: F401

NEG = -1e30

# weight-stack indices (order matters; see collect order in layers/attention.py)
W_Q, W_FK, W_FV, W_TK, W_TV = 0, 1, 2, 3, 4
W_SD, W_XD, W_SG, W_XG, W_GD = 5, 6, 7, 8, 9
W_BL1, W_BL2, W_D1, W_D2 = 10, 11, 12, 13
LN1_S, LN1_B, LNT_S, LNT_B, LN2_S, LN2_B = 0, 1, 2, 3, 4, 5


def _ln(x, s, b, eps=1e-6):
    x = x.astype(jnp.float32)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * s + b


def _dot(a, b):
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _branch_attention(q, kv_src, Wk, bk, Wv, bv, add_mask, H, cd):
    """One attention branch: q (F, D) f32, kv_src (T, D) in compute dtype cd.
    add_mask (F, T): 0 where attendable, NEG otherwise.
    Matmul operands stay in cd (bf16 on the serving path — 4-8x the MXU rate
    of f32) with f32 accumulation; softmax math in f32.
    Returns the merged multi-head context (F, D) f32."""
    F, D = q.shape
    T = kv_src.shape[0]
    hd = D // H
    scale = 1.0 / math.sqrt(hd)
    k = (_dot(kv_src, Wk) + bk).astype(cd)    # (T, D)
    v = (_dot(kv_src, Wv) + bv).astype(cd)
    kT = jnp.swapaxes(k, 0, 1)                # (D, T) — one relayout per branch
    # lane → head index, built lane-aligned (no relayout)
    d_head = jax.lax.broadcasted_iota(jnp.int32, (1, D), 1) // hd
    qc = q.astype(cd)
    att = jnp.zeros((F, D), jnp.float32)
    for h in range(H):
        lane_h = (d_head == h).astype(cd)                # (1, D)
        scores = _dot(qc * lane_h, kT) * scale           # (F, T) f32, head h
        scores = scores + add_mask
        mx = jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.exp(scores - mx)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        att = att + _dot(p.astype(cd), v * lane_h)       # fills head-h lanes
    return att


def _dab_call(x, y, add_self, add_cross, fm_row, W, b, ln, xb, H, cd):
    """One DualAttentionBlock call for the stacked pair.
    x (F, D) from-side, y (T, D) to-side, fm_row (F,) from validity.
    add_self (F, F) / add_cross (F, T): additive masks.  Returns (F, D) f32.
    ``cd``: matmul operand dtype (the weights' dtype; f32 accumulation)."""
    xf = x.astype(jnp.float32)
    fn = _ln(xf, ln[LN1_S], ln[LN1_B]).astype(cd)
    tn = _ln(y.astype(jnp.float32), ln[LNT_S], ln[LNT_B]).astype(cd)

    q = _dot(fn, W[W_Q]) + b[W_Q]
    s_att = _branch_attention(q, fn, W[W_FK], b[W_FK], W[W_FV], b[W_FV],
                              add_self, H, cd)
    x_att = _branch_attention(q, tn, W[W_TK], b[W_TK], W[W_TV], b[W_TV],
                              add_cross, H, cd)

    s_value = _dot(s_att.astype(cd), W[W_SD]) + b[W_SD]
    x_value = _dot(x_att.astype(cd), W[W_XD]) + b[W_XD]
    s_score = _dot(s_value.astype(cd), W[W_SG]) + b[W_SG]
    x_score = _dot(x_value.astype(cd), W[W_XG]) + b[W_XG]
    guided = _dot((s_score * x_value + x_score * s_value).astype(cd),
                  W[W_GD]) + b[W_GD]
    gc = guided.astype(cd)

    # BiLinear: shared dense applied to both inputs (its bias lands twice),
    # plus the extra bias_value (layers/attention.py::BiLinear)
    scores = _dot(fn, W[W_BL1]) + _dot(gc, W[W_BL1]) + 2.0 * b[W_BL1] + xb[0]
    values = _dot(fn, W[W_BL2]) + _dot(gc, W[W_BL2]) + 2.0 * b[W_BL2] + xb[1]
    gate = jax.nn.sigmoid(scores + NEG * (1.0 - fm_row[:, None]))
    dma = gate * values

    d1 = _dot(dma.astype(cd), W[W_D1]) + b[W_D1]
    residual = d1 + xf
    z = _ln(residual, ln[LN2_S], ln[LN2_B])
    return _dot(z.astype(cd), W[W_D2]) + b[W_D2] + residual


def _masks(vm, tm, Lv, Lt):
    """Additive masks for the stacked pair (F=2Lv rows, self + cross)."""
    F, T = vm.shape[0], tm.shape[0]

    def block_mask(fm, to, Lf, Lto):
        Fr, Tc = fm.shape[0], to.shape[0]
        ri = jax.lax.broadcasted_iota(jnp.int32, (Fr, Tc), 0) // Lf
        ci = jax.lax.broadcasted_iota(jnp.int32, (Fr, Tc), 1) // Lto
        ok = (ri == ci).astype(jnp.float32) * fm[:, None] * to[None, :]
        return NEG * (1.0 - ok)

    return (block_mask(vm, vm, Lv, Lv), block_mask(vm, tm, Lv, Lt),
            block_mask(tm, tm, Lt, Lt), block_mask(tm, vm, Lt, Lv))


def _stack_kernel(v_ref, t_ref, vm_ref, tm_ref,
                  W_ref, b_ref, ln_ref, xb_ref, vo_ref, to_ref, *, Lv, Lt, H):
    v = v_ref[0]            # (2*Lv, D)
    t = t_ref[0]            # (2*Lt, D)
    vm = vm_ref[0, 0].astype(jnp.float32)
    tm = tm_ref[0, 0].astype(jnp.float32)
    W = W_ref[...]                       # (2, 14, D, D) — compute dtype
    cd = W.dtype
    b = b_ref[...].astype(jnp.float32)
    ln = ln_ref[...].astype(jnp.float32)
    xb = xb_ref[...].astype(jnp.float32)

    m_vv, m_vt, m_tt, m_tv = _masks(vm, tm, Lv, Lt)

    v1 = _dab_call(v, t, m_vv, m_vt, vm, W[0], b[0], ln[0], xb[0], H, cd)
    t1 = _dab_call(t, v, m_tt, m_tv, tm, W[0], b[0], ln[0], xb[0], H, cd)
    v2 = _dab_call(v1, t1, m_vv, m_vt, vm, W[1], b[1], ln[1], xb[1], H, cd)
    t2 = _dab_call(t1, v1, m_tt, m_tv, tm, W[1], b[1], ln[1], xb[1], H, cd)

    vo_ref[0] = v2.astype(vo_ref.dtype)
    to_ref[0] = t2.astype(to_ref.dtype)


def _round_up(n, m):
    return ((n + m - 1) // m) * m


def dual_attention_stack(vfeat, tfeat, vmask, tmask, p1, p2, num_heads,
                         *, interpret: bool = False):
    """Run the full 2-layer dual-attention stack fused.

    vfeat (B, Lv, D), tfeat (B, Lt, D); masks (B, L) float {0,1}.
    p1/p2: stacked param dicts from ``DualAttentionBlockParams``
    ({'W': (14, D, D), 'b': (14, D), 'ln': (6, D), 'xb': (2, D)}).
    Returns (vfeat', tfeat') with the original shapes.
    """
    B, Lv, D = vfeat.shape
    Lt = tfeat.shape[1]
    dtype = vfeat.dtype

    Lv_p, Lt_p = _round_up(Lv, 8), _round_up(Lt, 8)
    B_p = _round_up(B, 2)

    def pad(x, Bp, Lp):
        return jnp.pad(x, ((0, Bp - x.shape[0]), (0, Lp - x.shape[1]))
                       + ((0, 0),) * (x.ndim - 2))

    v = pad(vfeat, B_p, Lv_p).reshape(B_p // 2, 2 * Lv_p, D)
    t = pad(tfeat, B_p, Lt_p).reshape(B_p // 2, 2 * Lt_p, D)
    vm = pad(vmask.astype(dtype), B_p, Lv_p).reshape(B_p // 2, 1, 2 * Lv_p)
    tm = pad(tmask.astype(dtype), B_p, Lt_p).reshape(B_p // 2, 1, 2 * Lt_p)

    W = jnp.stack([p1["W"], p2["W"]])      # (2, 14, D, D)
    bb = jnp.stack([p1["b"], p2["b"]])
    ln = jnp.stack([p1["ln"], p2["ln"]])
    xb = jnp.stack([p1["xb"], p2["xb"]])

    grid = (B_p // 2,)
    row = lambda L: pl.BlockSpec((1, 2 * L, D), lambda i: (i, 0, 0))
    mrow = lambda L: pl.BlockSpec((1, 1, 2 * L), lambda i: (i, 0, 0))
    const = lambda s: pl.BlockSpec(s, lambda i: (0,) * len(s))

    vo, to = pl.pallas_call(
        functools.partial(_stack_kernel, Lv=Lv_p, Lt=Lt_p, H=num_heads),
        out_shape=(jax.ShapeDtypeStruct(v.shape, dtype),
                   jax.ShapeDtypeStruct(t.shape, dtype)),
        grid=grid,
        in_specs=[row(Lv_p), row(Lt_p), mrow(Lv_p), mrow(Lt_p),
                  const(W.shape), const(bb.shape), const(ln.shape), const(xb.shape)],
        out_specs=(row(Lv_p), row(Lt_p)),
        interpret=interpret,
    )(v, t, vm, tm, W, bb, ln, xb)

    vo = vo.reshape(B_p, Lv_p, D)[:B, :Lv]
    to = to.reshape(B_p, Lt_p, D)[:B, :Lt]
    return vo, to
