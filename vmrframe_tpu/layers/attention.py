"""Attention blocks: SeqPAN's dual self/cross attention + QANet CQAttention.

Behavioral port of models/layers.py:184-468 (reference), designed so every
score computation is one batched MXU matmul with additive -1e30 masking.

Parity notes vs the reference:

- ``BiLinear`` (models/layers.py:246-263) creates a ``dense_2`` submodule but
  applies ``dense_1`` to BOTH inputs; the inert dense_2 receives no gradient
  and never changes.  We simply don't create it (the checkpoint converter
  drops the dead tensors).
- ``DualMultiAttention`` (models/layers.py:300-381) also creates layer_norm1/
  layer_norm2/out_layer that its forward never uses — same treatment.
"""

from __future__ import annotations

import math
import jax
import jax.numpy as jnp
from flax import linen as nn

from vmrframe_tpu.layers.dropout import Dropout

from vmrframe_tpu.layers.basic import Conv1D, LayerNorm
from vmrframe_tpu.ops.masking import attention_mask_2d, mask_logits


class ProjParams(nn.Module):
    """Registers a Conv1D-shaped (kernel, bias) pair WITHOUT running the
    matmul — lets callers concatenate several projections of the same input
    into ONE MXU matmul (the model is launch/memory-bound at these dims, so
    fewer, wider matmuls win) while keeping the checkpoint tree identical to
    the unfused Conv1D layout."""

    out_dim: int

    @nn.compact
    def __call__(self, in_dim: int):
        from vmrframe_tpu.layers.basic import torch_bias_init_for, torch_linear_init

        kernel = self.param("kernel", torch_linear_init, (in_dim, self.out_dim))
        bias = self.param("bias", torch_bias_init_for(in_dim), (self.out_dim,))
        return kernel, bias


def fused_proj(x, kbs):
    """One matmul for several (kernel, bias) pairs over the same input;
    returns the per-projection outputs."""
    from vmrframe_tpu.ops.precision import biased

    ks = jnp.concatenate([k for k, _ in kbs], axis=1)
    bs = jnp.concatenate([jnp.asarray(b) for _, b in kbs], axis=0)
    import os

    if os.environ.get("VMR_MM2D"):  # layout experiment: canonical 2D GEMM
        y2 = x.reshape(-1, x.shape[-1]) @ ks
        y = biased(y2.reshape(*x.shape[:-1], y2.shape[-1]), bs)
    else:
        y = biased(x @ ks, bs)
    sizes = [k.shape[1] for k, _ in kbs]
    outs, off = [], 0
    for s in sizes:
        outs.append(y[..., off : off + s])
        off += s
    return outs


def _proj_from_heads(ctx4, kbs):
    """Output projection(s) read directly off the (B, H, L, hd) attention
    output: the head merge folds into the contraction over (h, d), so the
    merged (B, L, D) tensor never materializes.  Round-3 traces
    (docs/TRACE_EVAL_B128.json) showed the merged tensor's layout being
    repaired by a physical copy before every downstream matmul; this is the
    round-4 fix the trace asked for.  Mathematically identical to
    merge-then-matmul (same contraction, one dot)."""
    from vmrframe_tpu.ops.precision import biased

    H, hd = ctx4.shape[1], ctx4.shape[3]
    ks = jnp.concatenate([k for k, _ in kbs], axis=1)
    bs = jnp.concatenate([jnp.asarray(b) for _, b in kbs], axis=0)
    y = biased(jnp.einsum("bhld,hde->ble", ctx4, ks.reshape(H, hd, -1)), bs)
    outs, off = [], 0
    for k, _ in kbs:
        s = k.shape[1]
        outs.append(y[..., off : off + s])
        off += s
    return outs


def _attn_variant():
    """Layout-formulation knob for the dual-attention score/apply chain.

    Round-4 on-chip A/B at the headline config (B=128 Charades bench.py,
    same session, v0 control 140.9k q/s):

      v0  — round-3 form: reshape-only heads, merge-then-matmul tail
            (DEFAULT — every alternative measured worse)
      v2  — folded tail: apply emits (B,H,L,hd), output projections contract
            (h,d) directly (no merged tensor)        → 135.6k q/s (-3.8%)
      v2t — v2 with operands pre-transposed          → 135.0k q/s (-4.2%)
      v3  — self+cross K concatenated, one score dot → compile blow-up (DNF
            inside a 900 s bench budget)
      v23 — v3 scores + v2 folded tail               →  95.8k q/s (-32%)

    i.e. the round-3 VERDICT's suggested rewrites (fold the head merge into
    the output projection; feed the dot emitter its preferred layouts) are
    measured NEGATIVES: the folded (h,d) contraction is a worse TPU dot than
    the merged 2D GEMM, and removing the repair copies costs more in the ops
    that replace them.  The ~259 us/step of layout copies
    (docs/TRACE_EVAL_B128.json) are the price of XLA choosing B-on-lanes for
    the LN/stat fusions while the dot emitter wants D-on-lanes operands —
    see BASELINE.md "Round-4 attempts" for the full record.
    """
    import os

    return os.environ.get("VMR_ATTN_VARIANT", "v0")


def _split_heads(x, num_heads):
    """(B, L, D) -> (B, L, H, hd) — a RESHAPE only, no transpose.

    Round-3 device traces (tools/trace_profile.py, docs/TRACE_EVAL_B128.json)
    showed the old ``transpose(0, 2, 1, 3)`` to (B, H, L, hd) materializing as
    physical layout copies XLA could not fold — 12 copies × 8-13 us ≈ 130 us
    of the 970 us eval step at the headline config.  Head-batched 4D dots
    can't avoid them either: the TPU dot emitter wants batch dims majormost,
    so "blhd,bmhd->bhlm" still transposes both operands.  ``head_attention``
    below is the layout-clean form."""
    B, L, D = x.shape
    return x.reshape(B, L, num_heads, D // num_heads)


def _merge_heads(x):
    B, L, H, Hd = x.shape
    return x.reshape(B, L, H * Hd)


def head_attention(q, k, v, mask_add, scale, drop, num_heads):
    """Multi-head attention over NON-head-split (B, L, D) q / (B, M, D) k, v.

    ``mask_add`` is an additive (B, L|1, M) logit mask shared by all heads;
    ``drop`` is applied to the prob tensor.  Internally uses head-batched 4D
    einsums on reshaped (not transposed) operands — of the three measured
    formulations this is the fastest on the v5e at the shipped dims
    (docs/TRACE_EVAL_B128.json):

      (a) transpose to (B, H, L, hd) + bhld einsums   — 971 us eval step
      (b) reshape-only + "blhd,bmhd->bhlm" einsums    — 945 us (this form)
      (c) per-head lane-slice 3D dots, batch-leading  — 1222 us

    (c) kills the layout copies (the TPU dot emitter transposes operands so
    batch dims lead for (a)/(b)) but pays more in 2×num_heads separate
    score/softmax/apply chains; (b) lets XLA keep the operand transposes
    fused where it can.  The math is EXACTLY the reference's per-head
    attention — same contractions, same softmax ordering.
    """
    s_q = _split_heads(q, num_heads)
    s_k = _split_heads(k, num_heads)
    s_v = _split_heads(v, num_heads)
    s = jnp.einsum("blhd,bmhd->bhlm", s_q, s_k) * scale
    if mask_add is not None:
        s = s + (mask_add[:, None] if mask_add.ndim == 3 else mask_add)
    p = drop(jax.nn.softmax(s, axis=-1))
    return _merge_heads(jnp.einsum("bhlm,bmhd->blhd", p, s_v))


class MultiHeadAttentionBlock(nn.Module):
    """Pre-LN MHA + FFN-ish tail (models/layers.py:184-231)."""

    dim: int
    num_heads: int
    droprate: float = 0.0

    @nn.compact
    def __call__(self, x, mask=None, deterministic: bool = True):
        drop = lambda t: Dropout(self.droprate)(t, deterministic=deterministic)
        head_size = self.dim // self.num_heads
        output = LayerNorm(name="layer_norm1")(x)
        output = drop(output)
        query = Conv1D(self.dim, name="query")(output)
        key = Conv1D(self.dim, name="key")(output)
        value = Conv1D(self.dim, name="value")(output)
        mask_add = None if mask is None else \
            -1e30 * (1.0 - mask[:, None, :].astype(query.dtype))
        value = head_attention(query, key, value, mask_add,
                               1.0 / math.sqrt(head_size), drop, self.num_heads)
        output = drop(value)
        residual = output + x
        output = LayerNorm(name="layer_norm2")(residual)
        output = drop(output)
        output = Conv1D(self.dim, name="out_layer")(output)
        return drop(output) + residual


class BiLinear(nn.Module):
    """sum of one shared Dense applied to both inputs + extra bias — the
    reference's (quirky) BiLinear (models/layers.py:246-263).

    (Row-stacking the two inputs into one matmul was measured SLOWER here —
    the concat copy outweighs the saved launch at these sizes.)"""

    dim: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, input1, input2):
        dense_1 = Conv1D(self.dim, name="dense_1")
        output = dense_1(input1) + dense_1(input2)
        if self.use_bias:
            bias = self.param("bias_value", nn.initializers.zeros, (self.dim,))
            from vmrframe_tpu.ops.precision import biased

            output = biased(output, bias)
        return output


class DualMultiAttention(nn.Module):
    """SeqPAN's core op (models/layers.py:300-381): one shared query attends
    over itself (f_key/f_value) and over the other modality (t_key/t_value);
    the two attention outputs cross-gate each other, then two BiLinears gate
    the fused output against the block input.

    The two softmax attentions share the same Q — a natural fusion target
    (see vmrframe_tpu/kernels/dual_attention.py for the Pallas version).
    """

    dim: int
    num_heads: int
    droprate: float = 0.0
    # Fused Pallas dual-attention kernel (kernels/attention.py).  Measured on
    # v5e (docs/BENCH_KERNELS.json, round 2): XLA's own fusion wins at BOTH
    # shipped regimes — Charades B=128/H=4/L=64/hd=32 (0.016 vs 0.24 ms) and
    # TACoS B=64/H=8/L=256/hd=16 (0.60 vs 1.43 ms).  Tiles this small
    # underutilize the MXU and the per-(b,h) grid serializes; XLA fuses the
    # two softmaxes into the matmuls already.  PARKED opt-in: kept correct
    # (tests/test_pallas_kernels.py) for the regime where L·M outgrows
    # VMEM-friendly fusion, which no shipped config reaches.  The Pallas
    # kernel that DOES win in production is the banded window-attention one
    # (kernels/window_attention.py, auto-enabled in layers/actionformer.py).
    use_pallas: bool = False

    @nn.compact
    def __call__(self, from_tensor, to_tensor, from_mask, to_mask, deterministic: bool = True):
        B, L, D = from_tensor.shape
        head_size = self.dim // self.num_heads
        drop = lambda t: Dropout(self.droprate)(t, deterministic=deterministic)

        Din = from_tensor.shape[-1]
        q_kb = ProjParams(self.dim, name="query")(Din)
        fk_kb = ProjParams(self.dim, name="f_key")(Din)
        fv_kb = ProjParams(self.dim, name="f_value")(Din)
        tk_kb = ProjParams(self.dim, name="t_key")(to_tensor.shape[-1])
        tv_kb = ProjParams(self.dim, name="t_value")(to_tensor.shape[-1])
        q_o, fk_o, fv_o = fused_proj(from_tensor, [q_kb, fk_kb, fv_kb])
        tk_o, tv_o = fused_proj(to_tensor, [tk_kb, tv_kb])

        s_attn_mask = attention_mask_2d(from_mask, from_mask)
        x_attn_mask = attention_mask_2d(from_mask, to_mask)

        from vmrframe_tpu.kernels.attention import fused_dual_attention, pallas_supported

        no_dropout = deterministic or self.droprate == 0.0
        s_ctx = x_ctx = None
        if self.use_pallas and no_dropout and pallas_supported():
            # the parked Pallas kernel consumes (B, H, L, hd) tiles
            def hsplit(x):
                return _split_heads(x, self.num_heads).transpose(0, 2, 1, 3)

            s_val_h, x_val_h = fused_dual_attention(
                hsplit(q_o), hsplit(fk_o), hsplit(fv_o), hsplit(tk_o),
                hsplit(tv_o), s_attn_mask, x_attn_mask,
            )
            s_val_m = _merge_heads(s_val_h.transpose(0, 2, 1, 3))
            x_val_m = _merge_heads(x_val_h.transpose(0, 2, 1, 3))
        else:
            scale = 1.0 / math.sqrt(head_size)
            var = _attn_variant()
            if var == "v0":
                s_val_m = head_attention(q_o, fk_o, fv_o, (1.0 - s_attn_mask) * -1e30,
                                         scale, drop, self.num_heads)
                x_val_m = head_attention(q_o, tk_o, tv_o, (1.0 - x_attn_mask) * -1e30,
                                         scale, drop, self.num_heads)
            else:
                H = self.num_heads
                sq, sfk, sfv = (_split_heads(t, H) for t in (q_o, fk_o, fv_o))
                stk, stv = (_split_heads(t, H) for t in (tk_o, tv_o))
                s_add = ((1.0 - s_attn_mask) * -1e30)[:, None]
                x_add = ((1.0 - x_attn_mask) * -1e30)[:, None]
                if var == "v2t":
                    sq, sfk, sfv, stk, stv = (
                        t.transpose(0, 2, 1, 3) for t in (sq, sfk, sfv, stk, stv))
                    s_scores = jnp.einsum("bhld,bhmd->bhlm", sq, sfk) * scale + s_add
                    x_scores = jnp.einsum("bhld,bhmd->bhlm", sq, stk) * scale + x_add
                elif var in ("v3", "v23"):
                    kcat = jnp.concatenate([sfk, stk], axis=1)
                    sc = jnp.einsum("blhd,bnhd->bhln", sq, kcat) * scale
                    Lf = sfk.shape[1]
                    s_scores = sc[..., :Lf] + s_add
                    x_scores = sc[..., Lf:] + x_add
                else:  # v2
                    s_scores = jnp.einsum("blhd,bmhd->bhlm", sq, sfk) * scale + s_add
                    x_scores = jnp.einsum("blhd,bmhd->bhlm", sq, stk) * scale + x_add
                s_p = drop(jax.nn.softmax(s_scores, axis=-1))
                x_p = drop(jax.nn.softmax(x_scores, axis=-1))
                if var == "v2t":
                    s_ctx = jnp.einsum("bhlm,bhmd->bhld", s_p, sfv)
                    x_ctx = jnp.einsum("bhlm,bhmd->bhld", x_p, stv)
                elif var == "v3":
                    s_ctx = x_ctx = None
                    s_val_m = _merge_heads(jnp.einsum("bhlm,bmhd->blhd", s_p, sfv))
                    x_val_m = _merge_heads(jnp.einsum("bhlm,bmhd->blhd", x_p, stv))
                else:  # v2 / v23: folded tail consumes (B, H, L, hd)
                    s_ctx = jnp.einsum("bhlm,bmhd->bhld", s_p, sfv)
                    x_ctx = jnp.einsum("bhlm,bmhd->bhld", x_p, stv)

        sd_kb = ProjParams(self.dim, name="s_dense")(self.dim)
        xd_kb = ProjParams(self.dim, name="x_dense")(self.dim)
        sg_kb = ProjParams(self.dim, name="s_gate")(self.dim)
        xg_kb = ProjParams(self.dim, name="x_gate")(self.dim)

        # The reference applies s_gate directly to s_dense's output with
        # nothing in between (models/layers.py:359-366), so the chain
        # collapses algebraically: gate(dense(h)) = h @ (Wd Wg) + (bd Wg + bg).
        # One wide matmul per branch yields (value, score) together — the
        # composite kernels are loop-invariant and hoist out of serving loops.
        s_comp = (sd_kb[0] @ sg_kb[0], sd_kb[1] @ sg_kb[0] + sg_kb[1])
        x_comp = (xd_kb[0] @ xg_kb[0], xd_kb[1] @ xg_kb[0] + xg_kb[1])
        if s_ctx is not None:
            s_value, s_score = _proj_from_heads(s_ctx, [sd_kb, s_comp])
            x_value, x_score = _proj_from_heads(x_ctx, [xd_kb, x_comp])
        else:
            s_value, s_score = fused_proj(s_val_m, [sd_kb, s_comp])
            x_value, x_score = fused_proj(x_val_m, [xd_kb, x_comp])

        outputs = s_score * x_value + x_score * s_value
        outputs = Conv1D(self.dim, name="guided_dense")(outputs)

        # BiLinear applies ONE shared dense to both inputs (the reference
        # quirk, models/layers.py:257-259), so bilinear(x1, x2) =
        # W(x1+x2) + 2b + bias_value — half the matmul work; and both
        # bilinears read the same (from_tensor + outputs) sum, so the pair is
        # one wide matmul.  Param tree identical to the BiLinear modules.
        b1_k, b1_b, b1_x = _BiLinearParams(self.dim, name="bilinear_1")(self.dim)
        b2_k, b2_b, b2_x = _BiLinearParams(self.dim, name="bilinear_2")(self.dim)
        u = from_tensor + outputs
        scores, values = fused_proj(
            u, [(b1_k, 2.0 * b1_b + b1_x), (b2_k, 2.0 * b2_b + b2_x)])
        return jax.nn.sigmoid(mask_logits(scores, from_mask[:, :, None])) * values


class DualAttentionBlock(nn.Module):
    """LN -> DualMultiAttention -> dense+residual -> FFN+residual
    (models/layers.py:266-297)."""

    dim: int
    num_heads: int
    droprate: float = 0.0
    use_bias: bool = True

    @nn.compact
    def __call__(self, from_tensor, to_tensor, from_mask, to_mask, deterministic: bool = True):
        drop = lambda t: Dropout(self.droprate)(t, deterministic=deterministic)
        outputs = LayerNorm(name="layer_norm_1")(from_tensor)
        to_norm = LayerNorm(name="layer_norm_t")(to_tensor)
        outputs = drop(outputs)
        outputs = DualMultiAttention(self.dim, self.num_heads, self.droprate, name="dual_multihead_attention")(
            outputs, to_norm, from_mask, to_mask, deterministic
        )
        outputs = Conv1D(self.dim, use_bias=self.use_bias, name="dense_1")(outputs)
        residual = drop(outputs) + from_tensor
        outputs = LayerNorm(name="layer_norm_2")(residual)
        outputs = drop(outputs)
        outputs = Conv1D(self.dim, use_bias=self.use_bias, name="dense_2")(outputs)
        return drop(outputs) + residual


class _LNParams(nn.Module):
    """Registers LayerNorm's (scale, bias) without running it."""

    @nn.compact
    def __call__(self, dim: int):
        scale = self.param("scale", nn.initializers.ones, (dim,))
        bias = self.param("bias", nn.initializers.zeros, (dim,))
        return scale, bias


class _BiLinearParams(nn.Module):
    """Registers BiLinear's tree (dense_1/{kernel,bias}, bias_value)."""

    dim: int

    @nn.compact
    def __call__(self, in_dim: int):
        k, b = ProjParams(self.dim, name="dense_1")(in_dim)
        xb = self.param("bias_value", nn.initializers.zeros, (self.dim,))
        return k, b, xb


class _DualMultiAttentionParams(nn.Module):
    dim: int

    @nn.compact
    def __call__(self):
        D = self.dim
        kbs, bs = [], []
        for name in ("query", "f_key", "f_value", "t_key", "t_value",
                     "s_dense", "x_dense", "s_gate", "x_gate", "guided_dense"):
            k, b = ProjParams(D, name=name)(D)
            kbs.append(k)
            bs.append(b)
        k1, b1, xb1 = _BiLinearParams(D, name="bilinear_1")(D)
        k2, b2, xb2 = _BiLinearParams(D, name="bilinear_2")(D)
        kbs += [k1, k2]
        bs += [b1, b2]
        return kbs, bs, (xb1, xb2)


class DualAttentionBlockParams(nn.Module):
    """Registers EXACTLY the parameter tree of ``DualAttentionBlock`` (same
    submodule names, shapes, and initializers) and returns it as the stacked
    arrays the fused Pallas stack kernel consumes
    (kernels/dual_stack.py: W (14, D, D), b (14, D), ln (6, D), xb (2, D)).
    Init through either code path yields an identical checkpoint tree, so the
    XLA train path and the fused eval path share parameters freely."""

    dim: int
    num_heads: int
    droprate: float = 0.0
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        D = self.dim
        ln1 = _LNParams(name="layer_norm_1")(D)
        lnt = _LNParams(name="layer_norm_t")(D)
        kbs, bs, (xb1, xb2) = _DualMultiAttentionParams(
            D, name="dual_multihead_attention")()
        kd1, bd1 = ProjParams(D, name="dense_1")(D)
        ln2 = _LNParams(name="layer_norm_2")(D)
        kd2, bd2 = ProjParams(D, name="dense_2")(D)
        W = jnp.stack(kbs + [kd1, kd2])                     # (14, D, D)
        b = jnp.stack(bs + [bd1, bd2])                      # (14, D)
        ln = jnp.stack([ln1[0], ln1[1], lnt[0], lnt[1], ln2[0], ln2[1]])
        xb = jnp.stack([xb1, xb2])
        return {"W": W, "b": b, "ln": ln, "xb": xb}


class CQAttention(nn.Module):
    """QANet context-query attention (models/layers.py:402-437): trilinear
    scores via three rank-1/elementwise terms, row+col masked softmaxes,
    ``[c, c2q, c*c2q, c*q2c]`` -> Conv1D."""

    dim: int
    droprate: float = 0.0

    @nn.compact
    def __call__(self, context, query, c_mask, q_mask, deterministic: bool = True):
        w4C = self.param("w4C", nn.initializers.xavier_uniform(), (self.dim, 1))
        w4Q = self.param("w4Q", nn.initializers.xavier_uniform(), (self.dim, 1))
        w4mlu = self.param("w4mlu", nn.initializers.xavier_uniform(), (1, 1, self.dim))
        drop = lambda t: Dropout(self.droprate)(t, deterministic=deterministic)

        ctx = drop(context)
        qry = drop(query)
        # trilinear attention: score[b,i,j] = w4C·c_i + w4Q·q_j + w4mlu·(c_i ⊙ q_j)
        subres0 = jnp.matmul(ctx, w4C)  # (B, Lc, 1)
        subres1 = jnp.matmul(qry, w4Q).transpose(0, 2, 1)  # (B, 1, Lq)
        subres2 = jnp.einsum("bld,bmd->blm", ctx * w4mlu, qry)
        score = subres0 + subres1 + subres2  # (B, Lc, Lq)

        score_ = jax.nn.softmax(mask_logits(score, q_mask[:, None, :]), axis=2)
        score_t = jax.nn.softmax(mask_logits(score, c_mask[:, :, None]), axis=1)
        score_t = score_t.transpose(0, 2, 1)  # (B, Lq, Lc)
        c2q = jnp.matmul(score_, query)  # (B, Lc, D)
        q2c = jnp.matmul(jnp.matmul(score_, score_t), context)  # (B, Lc, D)
        output = jnp.concatenate([context, c2q, context * c2q, context * q2c], axis=2)
        return Conv1D(self.dim, name="cqa_linear")(output)


class WeightedPool(nn.Module):
    """Learned attention pooling to a vector (models/layers.py:440-453)."""

    dim: int

    @nn.compact
    def __call__(self, x, mask):
        weight = self.param("weight", nn.initializers.xavier_uniform(), (self.dim, 1))
        alpha = jnp.tensordot(x, weight, axes=1)  # (B, L, 1)
        alpha = mask_logits(alpha, mask[:, :, None])
        alphas = jax.nn.softmax(alpha, axis=1)
        pooled = jnp.einsum("bld,blo->bdo", x, alphas)  # (B, D, 1)
        return pooled.squeeze(2)


class CQConcatenate(nn.Module):
    """Pooled query broadcast-concat + Conv1D (models/layers.py:456-468)."""

    dim: int

    @nn.compact
    def __call__(self, context, query, q_mask):
        pooled_query = WeightedPool(self.dim, name="weighted_pool")(query, q_mask)
        L = context.shape[1]
        pooled = jnp.broadcast_to(pooled_query[:, None, :], (context.shape[0], L, self.dim))
        output = jnp.concatenate([context, pooled], axis=2)
        return Conv1D(self.dim, name="conv1d")(output)
