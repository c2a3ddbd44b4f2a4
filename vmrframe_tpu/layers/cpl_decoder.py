"""Gaussian-weighted transformer decoder for CPL (reference models/cpl_lib.py).

Post-norm decoder layers whose attention probabilities are reweighted by a
proposal Gaussian AFTER the softmax and renormalized
(cpl_lib.py:189-195) — the mechanism that focuses reconstruction on one
temporal proposal.  Causal (future) masking on the target self-attention
matches cpl_lib.py:302-326.  The fairseq softmax dependency is plain
jax.nn.softmax here.
"""

from __future__ import annotations

import math
import jax
import jax.numpy as jnp
from flax import linen as nn

from vmrframe_tpu.layers.dropout import Dropout

from vmrframe_tpu.layers.basic import torch_linear_init
from vmrframe_tpu.ops.precision import biased


class GaussMultiheadAttention(nn.Module):
    """MHA with optional post-softmax Gaussian reweighting.

    Parameters follow the fairseq layout (joint in_proj (3E, E) xavier-init)
    so checkpoints convert directly.
    """

    embed_dim: int
    num_heads: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, query, key, value, key_padding_mask=None, attn_mask=None,
                 gauss_weight=None, deterministic: bool = True, n_props: int = 1):
        """``n_props=P > 1`` is the shared-prefix path: query/key/value and
        the masks arrive UNREPEATED at batch B while ``gauss_weight`` (if
        any) has B*P rows; the output has B*P rows.  The P proposal copies
        of one clip share q/k/v, the attention logits and the softmax — the
        reference repeats the inputs P times and recomputes all of it
        (models/model.py:150-166).  Exactness: the Gaussian weights only the
        KEYS, so (softmax(qk) * g_p) / rowsum @ v == (s @ (g_p*v)) / (s @ g_p)
        — in deterministic mode the per-proposal prob tensor never
        materializes; with dropout the probs are formed per-proposal AFTER
        the shared softmax so masks stay independent per (b, p) row."""
        B, Tq, E = query.shape
        Tk = key.shape[1]
        H = self.num_heads
        hd = E // H
        P = int(n_props)

        in_proj_w = self.param("in_proj_weight", nn.initializers.xavier_uniform(), (3 * E, E))
        in_proj_b = self.param("in_proj_bias", nn.initializers.zeros, (3 * E,))
        # fuse projections whose inputs alias (torch's MHA does the same,
        # F.multi_head_attention_forward): self-attn = ONE 3E matmul,
        # cross-attn = q + fused kv — identical weights, identical math
        if query is key and key is value:
            qkv = biased(query @ in_proj_w.T, in_proj_b)
            q, k, v = qkv[..., :E], qkv[..., E : 2 * E], qkv[..., 2 * E :]
        elif key is value:
            q = biased(query @ in_proj_w[:E].T, in_proj_b[:E])
            kv = biased(key @ in_proj_w[E:].T, in_proj_b[E:])
            k, v = kv[..., :E], kv[..., E:]
        else:
            q = biased(query @ in_proj_w[:E].T, in_proj_b[:E])
            k = biased(key @ in_proj_w[E : 2 * E].T, in_proj_b[E : 2 * E])
            v = biased(value @ in_proj_w[2 * E :].T, in_proj_b[2 * E :])
        q = q * (hd**-0.5)

        # reshape-only head split; heads ride as einsum batch dims.  The old
        # explicit transpose(0, 2, 1, 3) materialized five ~118 us layout
        # copies per CPL eval step at B·P=1024 (docs/TRACE_CPL_EVAL.json) —
        # form (b) of layers/attention.py::head_attention's measured A/B.
        q = q.reshape(B, Tq, H, hd)
        k = k.reshape(B, Tk, H, hd)
        v = v.reshape(B, Tk, H, hd)

        w = jnp.einsum("bqhd,bkhd->bhqk", q, k)
        if attn_mask is not None:  # (Tq, Tk) additive (-inf above diagonal)
            w = w + attn_mask[None, None]
        if key_padding_mask is not None:  # (B, Tk), 1 = PAD
            w = jnp.where(key_padding_mask[:, None, None, :] == 1, -1e30, w)
        # masked logits + softmax run f32 (the -inf mask promotes — good);
        # the prob tensor returns to the compute dtype for the value matmul
        w = jax.nn.softmax(w, axis=-1).astype(q.dtype)

        out_w = self.param("out_proj_kernel", nn.initializers.xavier_uniform(), (E, E))
        out_b = self.param("out_proj_bias", nn.initializers.zeros, (E,))

        if P > 1:
            if gauss_weight is not None:
                gw = gauss_weight.reshape(B, P, Tk) + 1e-10
                if deterministic:
                    num = jnp.einsum("bhqk,bpk,bkhd->bpqhd", w, gw, v)
                    den = jnp.einsum("bhqk,bpk->bpqh", w, gw)
                    out = num / den[..., None]
                else:
                    wp = w[:, None] * gw[:, :, None, None, :]  # (B,P,H,Tq,Tk)
                    wp = wp / jnp.sum(wp, axis=-1, keepdims=True)
                    wp = Dropout(self.dropout)(wp, deterministic=False)
                    out = jnp.einsum("bphqk,bkhd->bpqhd", wp, v)
            else:
                if deterministic:  # identical across P: project at B, tile once
                    o = jnp.einsum("bhqk,bkhd->bqhd", w, v)
                    o = biased(o.reshape(B, Tq, E) @ out_w, out_b)
                    return jnp.repeat(o, P, axis=0), jnp.mean(w, axis=1)
                wp = jnp.broadcast_to(w[:, None], (B, P, H, Tq, Tk))
                wp = Dropout(self.dropout)(wp, deterministic=False)
                out = jnp.einsum("bphqk,bkhd->bpqhd", wp, v)
            out = out.reshape(B * P, Tq, E)
            out = biased(out @ out_w, out_b)
            return out, jnp.mean(w, axis=1)

        if gauss_weight is not None:  # (B, Tk)
            gw = gauss_weight[:, None, None, :]
            w = w * (gw + 1e-10)
            w = w / jnp.sum(w, axis=-1, keepdims=True)
        w = Dropout(self.dropout)(w, deterministic=deterministic)
        out = jnp.einsum("bhqk,bkhd->bqhd", w, v).reshape(B, Tq, E)

        out = biased(out @ out_w, out_b)
        return out, jnp.mean(w, axis=1)


def _ln(x, scale, bias, eps=1e-5):
    mu = jnp.mean(x, -1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), -1, keepdims=True)
    out = (x - mu) * jax.lax.rsqrt(var + eps) * scale + bias
    # vector-param policy (ops/precision.py): cast back to activation dtype
    return out.astype(x.dtype) if out.dtype != x.dtype else out


class TransformerDecoderLayer(nn.Module):
    d_model: int
    num_heads: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, pad_mask, encoder_out=None, encoder_pad_mask=None,
                 self_attn_mask=None, src_gauss_weight=None, tgt_gauss_weight=None,
                 deterministic: bool = True, n_props: int = 1):
        D = self.d_model
        drop = lambda t: Dropout(self.dropout)(t, deterministic=deterministic)

        res = x
        x, weight = GaussMultiheadAttention(D, self.num_heads, self.dropout, name="self_attn")(
            x, x, x, pad_mask, self_attn_mask, tgt_gauss_weight, deterministic,
            n_props=n_props)
        if n_props > 1:  # shared-prefix layer: x entered at B, continue at B*P
            res = jnp.repeat(res, n_props, axis=0)
        x = _ln(res + drop(x),
                self.param("self_ln_scale", nn.initializers.ones, (D,)),
                self.param("self_ln_bias", nn.initializers.zeros, (D,)))

        if encoder_out is not None:
            res = x
            x, weight = GaussMultiheadAttention(D, self.num_heads, self.dropout, name="encoder_attn")(
                x, encoder_out, encoder_out, encoder_pad_mask, None, src_gauss_weight, deterministic)
            x = _ln(res + drop(x),
                    self.param("enc_ln_scale", nn.initializers.ones, (D,)),
                    self.param("enc_ln_bias", nn.initializers.zeros, (D,)))

        res = x
        w1 = self.param("fc1_kernel", torch_linear_init, (D, D * 2))
        b1 = self.param("fc1_bias", nn.initializers.zeros, (D * 2,))
        w2 = self.param("fc2_kernel", torch_linear_init, (D * 2, D))
        b2 = self.param("fc2_bias", nn.initializers.zeros, (D,))
        x = biased(jax.nn.relu(biased(x @ w1, b1)) @ w2, b2)
        x = _ln(res + drop(x),
                self.param("final_ln_scale", nn.initializers.ones, (D,)),
                self.param("final_ln_bias", nn.initializers.zeros, (D,)))
        return x, weight


class TransformerDecoder(nn.Module):
    """Stack with causal masking on the target (cpl_lib.py:293-326).

    ``src_mask``/``tgt_mask`` are {0,1} VALID masks like the rest of the
    framework; the reference flips them to pad masks internally — so do we.
    """

    num_layers: int
    d_model: int
    num_heads: int
    dropout: float = 0.0
    future_mask: bool = True
    remat: bool = False

    @nn.compact
    def __call__(self, src, src_mask, tgt, tgt_mask, src_gauss_weight=None,
                 tgt_gauss_weight=None, deterministic: bool = True,
                 n_props: int = 1):
        """``n_props=P > 1``: ``tgt``/``tgt_mask`` arrive UNREPEATED at batch
        B while ``src``/``src_mask``/gauss weights (if any) have B*P rows.
        Layer 0 runs the shared-prefix attention (q/k/v, logits and softmax
        computed once per clip instead of once per proposal) and expands to
        B*P; later layers are unchanged.  Output matches the repeated-input
        path exactly in deterministic mode (tests/test_cpl.py)."""
        T = tgt.shape[1]
        attn_mask = None
        if self.future_mask:
            attn_mask = jnp.triu(jnp.full((T, T), -jnp.inf), k=1)
        pad_tgt = None if tgt_mask is None else 1 - tgt_mask
        pad_src = None if src_mask is None else 1 - src_mask
        # Rematerialization (opt-in, MEASURED NEGATIVE at shipped dims): the
        # train-step backward otherwise saves every (B·P, H, Tq, Tk)
        # attention-probability tensor as a residual — at CPL's B·P=1024
        # those are ~67 MB f32 EACH, and the round-4 device trace
        # (docs/TRACE_CPL_TRAIN.json) shows the step HBM-bound on exactly
        # that traffic (189-202 MB fusions at 313-457 GB/s).  nn.remat saves
        # only the layer inputs and replays the layer (same dropout rng)
        # inside the backward.  On-chip A/B (docs/BENCH_ZOO.json round 4):
        # 28.15 -> 37.22 ms/step — the replayed forward's own HBM traffic +
        # extra scheduling exceeds the residual round-trips it saves, and
        # achieved bandwidth DROPS (374 -> 283 GB/s).  Kept as an opt-in
        # memory lever (``others.cpl_remat``) for larger-B·P regimes where
        # residuals would not fit HBM.  deterministic/n_props are static.
        layer_cls = TransformerDecoderLayer
        if self.remat:
            # flax counts self as argument 0: deterministic=8, n_props=9
            layer_cls = nn.remat(TransformerDecoderLayer, static_argnums=(8, 9))
        x = tgt
        weight = None
        for i in range(self.num_layers):
            x, weight = layer_cls(
                self.d_model, self.num_heads, self.dropout, name=f"layer_{i}"
            )(x, pad_tgt, src, pad_src, attn_mask, src_gauss_weight, tgt_gauss_weight,
              deterministic, n_props if i == 0 else 1)
            if i == 0 and n_props > 1 and pad_tgt is not None:
                pad_tgt = jnp.repeat(pad_tgt, n_props, axis=0)
        return x, weight
