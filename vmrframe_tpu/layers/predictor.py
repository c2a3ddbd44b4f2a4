"""SeqPAN predictor head.

Port of models/layers.py:567-671 (reference).  One deliberate fix: the
reference's ``TopSelfAttention2`` wraps ``torch.nn.MultiheadAttention`` but
feeds it (B, L, E) tensors while torch expects (L, B, E) — so it silently
attends ACROSS THE BATCH, mixing samples (models/layers.py:567-574).  That
accidental cross-sample attention cannot be sharded data-parallel and is a
bug, not a feature; we implement the intended per-sample masked
self-attention (the semantics of their hand-written ``TopSelfAttention``,
models/layers.py:576-610, plus the MultiheadAttention output projection).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import linen as nn

from vmrframe_tpu.layers.dropout import Dropout

from vmrframe_tpu.layers.basic import Conv1D, DepthwiseSeparableConvBlock, LayerNorm, PositionalEmbedding
from vmrframe_tpu.layers.attention import head_attention
from vmrframe_tpu.ops.masking import attention_mask_2d


class TopSelfAttention(nn.Module):
    """Masked multi-head self-attention with output projection."""

    dim: int
    num_heads: int
    droprate: float = 0.0

    @nn.compact
    def __call__(self, x, mask, deterministic: bool = True):
        from vmrframe_tpu.layers.attention import ProjParams, fused_proj

        B, L, D = x.shape
        head_size = self.dim // self.num_heads
        q_o, k_o, v_o = fused_proj(x, [ProjParams(self.dim, name="query")(D),
                                       ProjParams(self.dim, name="key")(D),
                                       ProjParams(self.dim, name="value")(D)])
        attn_mask = attention_mask_2d(mask, mask)
        drop = lambda t: Dropout(self.droprate)(t, deterministic=deterministic)
        out = head_attention(q_o, k_o, v_o, (1.0 - attn_mask) * -1e30,
                             1.0 / math.sqrt(head_size), drop, self.num_heads)
        return Conv1D(self.dim, name="out_proj")(out)


class FeatureEncoderPredict(nn.Module):
    """pos-emb + conv block + self-attn + FFN (models/layers.py:613-639)."""

    dim: int
    num_heads: int
    max_pos_len: int
    droprate: float = 0.0
    attn_drop: float = 0.0

    @nn.compact
    def __call__(self, x, mask, deterministic: bool = True):
        drop = lambda t: Dropout(self.droprate)(t, deterministic=deterministic)
        features = x + PositionalEmbedding(self.max_pos_len, name="pos_embedding")(x)
        features = DepthwiseSeparableConvBlock(self.dim, 7, 4, self.droprate, name="conv_block")(
            features, deterministic
        )
        outputs = LayerNorm(name="layer_norm_1")(features)
        outputs = drop(outputs)
        outputs = TopSelfAttention(self.dim, self.num_heads, self.attn_drop, name="top_self_attention")(
            outputs, mask, deterministic
        )
        residual = drop(outputs) + features
        outputs = LayerNorm(name="layer_norm_2")(residual)
        outputs = drop(outputs)
        outputs = Conv1D(self.dim, name="dense")(outputs)
        return drop(outputs) + residual


class SeqPANPredictor(nn.Module):
    """2× stacked FeatureEncoderPredict (start then end), LN,
    [feat ‖ input] -> hidden -> 1 logit per position (models/layers.py:642-671)."""

    dim: int
    max_pos_len: int
    num_heads: int = 4
    droprate: float = 0.0

    @nn.compact
    def __call__(self, x, mask, deterministic: bool = True):
        encoder = FeatureEncoderPredict(
            self.dim, self.num_heads, self.max_pos_len, self.droprate, self.droprate,
            name="feature_encoder",
        )
        start_feat = encoder(x, mask, deterministic)
        end_feat = encoder(start_feat, mask, deterministic)

        start_feat = LayerNorm(name="start_layer_norm")(start_feat)
        end_feat = LayerNorm(name="end_layer_norm")(end_feat)

        start_feat = Conv1D(self.dim, name="start_hidden")(jnp.concatenate([start_feat, x], axis=-1))
        end_feat = Conv1D(self.dim, name="end_hidden")(jnp.concatenate([end_feat, x], axis=-1))

        start_logits = Conv1D(1, name="start_dense")(start_feat).squeeze(-1)
        end_logits = Conv1D(1, name="end_dense")(end_feat).squeeze(-1)
        return start_logits, end_logits
