"""Masking primitives.

Semantics match the reference's additive -1e30 masking
(models/layers.py:9-12) and mask construction (utils/utils.py:131-136,
models/layers.py:235-244) — but as pure jax functions over static shapes.
"""

from __future__ import annotations

import jax.numpy as jnp

MASK_VALUE = -1e30


def mask_logits(inputs: jnp.ndarray, mask: jnp.ndarray, mask_value: float = MASK_VALUE) -> jnp.ndarray:
    """Additive masking: logits + mask_value * (1 - mask)."""
    return inputs + mask_value * (1.0 - mask.astype(inputs.dtype))


def length_to_mask(lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """(B,) int lengths -> (B, max_len) float {0,1} mask."""
    positions = jnp.arange(max_len)[None, :]
    return (positions < lengths[:, None]).astype(jnp.float32)


def attention_mask_2d(from_mask: jnp.ndarray, to_mask: jnp.ndarray) -> jnp.ndarray:
    """Outer product of (B, Lf) and (B, Lt) masks -> (B, Lf, Lt)."""
    return from_mask[:, :, None] * to_mask[:, None, :]
