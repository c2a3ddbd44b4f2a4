"""TPU-native dropout with a selectable mask-bit width.

The reference relies on torch's dropout everywhere (e.g. models/layers.py:90,
models/SeqPAN.py:60-75 via the shared blocks).  Flax's ``nn.Dropout`` draws a
full 32-bit word per element (``random.bernoulli`` -> u32 bits -> f32 uniform
-> compare): on an HBM-bound train step those raw-bit buffers are real money —
the round-4 SeqPAN train trace (docs/TRACE_SEQPAN_TRAIN.json) measured 269 MB
/step of rng-bit-generator output plus the layout copies XLA repairs the u32
tensors with (~109 us) and the compare fusions that re-read them (~150 us).

``bits=8`` draws ONE byte per element instead (the TPU backend lowers
``jax.random.bits(key, shape, uint8)`` to a native ``u8[...] rng-bit-generator``
— verified, not a u32 draw + truncate), quartering every raw-bit buffer.  The
keep decision becomes ``byte >= round(rate*256)``, so the REALIZED drop
probability is quantized to q = round(rate*256)/256 (e.g. 0.2 -> 51/256 =
0.19922, 0.1 -> 26/256 = 0.10156; exact for multiples of 1/256 such as 0.5).
The inverse scale uses q, NOT the nominal rate, so E[dropout(x)] == x exactly
for the mask actually applied.  The stream differs from flax's, which is free:
no parity claim anywhere pins a dropout stream (torch's generator could never
match either way), and every trajectory-parity test runs droprate=0.

``bits=32`` reproduces flax ``nn.Dropout`` bit-for-bit (same bernoulli call,
same rng fold path — the class name keeps flax's auto-naming identical), so
the default path is not a reimplementation risk.  Selection: the env override
``VMR_DROPOUT_BITS`` (A/B harnesses) beats ``train.dropout_bits`` (wired by
``Trainer.__init__`` via :func:`set_default_dropout_bits`) beats the built-in
default of 8.

Measured (same-session on-chip A/B at each family's shipped config,
docs/BENCH_ZOO.json rows stamped ``measured_round: 5`` — the ``*_u32drop``
twins force the flax-exact u32 masks): train ms/step u8 vs u32 —
SeqPAN 5.69 vs 6.16 (+8.3%), CPL 21.31 vs 22.75 (+6.8%),
CCA 56.94 vs 57.11 (parity; CCA's step is dominated by its 536 GFLOPs, the
mask bytes are a rounding error there).  Eval is unaffected (deterministic).
"""

from __future__ import annotations

import logging
import os
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

_DEFAULT_BITS = 8
_TRACED_WITH: Optional[int] = None  # bits value in effect at the first trace


def set_default_dropout_bits(bits: int) -> None:
    """Process-wide default (read at TRACE time); ``VMR_DROPOUT_BITS`` wins.

    The contract is "set before this trainer traces": the value is read when
    a Dropout module is traced, so a second Trainer with a different
    ``train.dropout_bits`` in the same process would retroactively disagree
    with the first one's already-compiled functions.  We can't fix a module
    global's scoping, but we can fail loud instead of silent: changing the
    value after any Dropout has traced logs a warning naming both values."""
    global _DEFAULT_BITS
    bits = int(bits)
    if _TRACED_WITH is not None and bits != _DEFAULT_BITS:
        logging.getLogger(__name__).warning(
            "set_default_dropout_bits(%d) called after a Dropout traced with "
            "bits=%d — already-compiled functions keep the old width; only "
            "future traces see the new value. Use one dropout_bits per "
            "process, or retrace everything.", bits, _TRACED_WITH)
    _DEFAULT_BITS = bits


def dropout_bits() -> int:
    env = os.environ.get("VMR_DROPOUT_BITS")
    return int(env) if env else _DEFAULT_BITS


class Dropout(nn.Module):
    """Drop-in for ``nn.Dropout`` at this repo's call sites (full-shape mask,
    ``dropout`` rng collection).

    ``deterministic`` must be passed explicitly (flax ``nn.Dropout`` raises
    when it is unspecified; a silent default of True would disable dropout
    at any call site that forgot it)."""

    rate: float
    rng_collection: str = "dropout"

    @nn.compact
    def __call__(self, x, deterministic: Optional[bool] = None):
        if deterministic is None:
            raise ValueError(
                "Dropout requires an explicit `deterministic` argument "
                "(matching flax nn.Dropout's fail-loud behavior).")
        global _TRACED_WITH
        if _TRACED_WITH is None:
            _TRACED_WITH = dropout_bits()
        if self.rate == 0.0 or deterministic:
            return x
        if self.rate == 1.0:
            return jnp.zeros_like(x)
        t = int(round(float(self.rate) * 256.0))
        if dropout_bits() == 8 and 0 < t < 256:
            rng = self.make_rng(self.rng_collection)
            draw = jax.random.bits(rng, x.shape, jnp.uint8)
            keep = draw >= jnp.uint8(t)
            # scale by the REALIZED keep probability (256-t)/256, not the
            # nominal one, so the expectation is exact for the applied mask
            scale = jnp.asarray(256.0 / (256 - t), x.dtype)
            return jnp.where(keep, x * scale, jnp.zeros((), x.dtype))
        # flax nn.Dropout's exact math and rng fold path (linen/stochastic.py)
        keep_prob = 1.0 - self.rate
        rng = self.make_rng(self.rng_collection)
        mask = jax.random.bernoulli(rng, p=keep_prob, shape=x.shape)
        return jax.lax.select(mask, x / keep_prob, jnp.zeros_like(x))
