"""VSLNet-legacy predictor layers (reference models/layers.py:471-563).

Kept for inventory parity: the reference retains HighLightLayer, DynamicRNN
and ConditionedPredictor from its VSLNet ancestry (only referenced from
commented-out model code, models/model.py:12-58), and they are the natural
building blocks for a VSLNet-style variant here.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from vmrframe_tpu.layers.basic import Conv1D, FeatureEncoder, LayerNorm
from vmrframe_tpu.layers.recurrent import LSTM
from vmrframe_tpu.ops.masking import mask_logits


class HighLightLayer(nn.Module):
    """Per-frame sigmoid highlighting score + weighted BCE loss
    (models/layers.py:471-493)."""

    @nn.compact
    def __call__(self, x, mask):
        logits = Conv1D(1, name="conv1d")(x).squeeze(-1)
        logits = mask_logits(logits, mask)
        return jax.nn.sigmoid(logits)

    @staticmethod
    def compute_loss(scores, labels, mask, epsilon: float = 1e-12):
        labels = labels.astype(jnp.float32)
        weights = jnp.where(labels == 0.0, labels + 1.0, 2.0 * labels)
        s = jnp.clip(scores, 1e-7, 1 - 1e-7)
        per = -(labels * jnp.log(s) + (1 - labels) * jnp.log(1 - s))
        per = per * weights * mask.astype(jnp.float32)
        return jnp.sum(per) / (jnp.sum(mask) + epsilon)


class DynamicRNN(nn.Module):
    """Unidirectional LSTM with output masking (models/layers.py:496-507)."""

    dim: int

    @nn.compact
    def __call__(self, x, mask):
        out = LSTM(self.dim, num_layers=1, bidirectional=False, name="lstm")(x, None)
        return out * mask[..., None]


class ConditionedPredictor(nn.Module):
    """VSLNet start/end predictor (models/layers.py:510-563): stacked RNN (or
    encoder) features, [feat ‖ input] -> hidden -> 1 logit, masked."""

    dim: int
    max_pos_len: int
    num_heads: int = 4
    droprate: float = 0.0
    predictor: str = "rnn"

    @nn.compact
    def __call__(self, x, mask, deterministic: bool = True):
        if self.predictor == "rnn":
            start_features = DynamicRNN(self.dim, name="start_encoder")(x, mask)
            end_features = DynamicRNN(self.dim, name="end_encoder")(start_features, mask)
        else:
            encoder = FeatureEncoder(self.dim, max_pos_len=self.max_pos_len,
                                     droprate=self.droprate, name="encoder")
            start_features = encoder(x, deterministic)
            end_features = encoder(start_features, deterministic)
            start_features = LayerNorm(name="start_layer_norm")(start_features)
            end_features = LayerNorm(name="end_layer_norm")(end_features)

        def block(feat, name):
            h = Conv1D(self.dim, name=f"{name}_hidden")(jnp.concatenate([feat, x], axis=2))
            h = jax.nn.relu(h)
            return Conv1D(1, name=f"{name}_out")(h).squeeze(-1)

        start_logits = mask_logits(block(start_features, "start_block"), mask)
        end_logits = mask_logits(block(end_features, "end_block"), mask)
        return start_logits, end_logits
