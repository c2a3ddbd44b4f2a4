"""LSTM layers via lax.scan — the TPU replacement for the reference's
packed-sequence BiLSTMs (models/BANlib/model.py:27-45,63-75).

torch packed-sequence semantics are reproduced exactly with static shapes:

- forward direction: steps beyond a sample's length produce zero outputs and
  do not advance that sample's state (irrelevant, outputs are zeroed);
- reverse direction: each sample's sequence is reversed WITHIN its valid
  length (gather by index), run forward, and un-reversed — identical to
  pack_padded_sequence(enforce_sorted=False) + a bidirectional LSTM.

Weight layout mirrors torch nn.LSTM (w_ih (4H, D), w_hh (4H, H), gate order
i, f, g, o) so checkpoint conversion is a direct copy.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


def _lstm_scan(x, mask, w_ih, w_hh, b_ih, b_hh):
    """x: (B, T, D); mask: (B, T) or None. Returns (B, T, H)."""
    B, T, D = x.shape
    H = w_hh.shape[1]
    # hoist the input projection out of the scan: one big MXU matmul
    xw = jnp.einsum("btd,gd->btg", x, w_ih) + b_ih + b_hh  # (B, T, 4H)

    def step(carry, inputs):
        h, c = carry
        xw_t, m_t = inputs
        gates = xw_t + h @ w_hh.T
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
        g = jnp.tanh(g)
        c_new = f * c + i * g
        h_new = o * jnp.tanh(c_new)
        if m_t is not None:
            m = m_t[:, None]
            h_new = h_new * m + h * (1 - m)
            c_new = c_new * m + c * (1 - m)
            out = h_new * m
        else:
            out = h_new
        return (h_new, c_new), out

    init = (jnp.zeros((B, H), x.dtype), jnp.zeros((B, H), x.dtype))
    xs = (xw.transpose(1, 0, 2), mask.T if mask is not None else None)
    if mask is None:
        xs = (xw.transpose(1, 0, 2), jnp.ones((T, B), x.dtype))
    _, outs = jax.lax.scan(step, init, xs)
    return outs.transpose(1, 0, 2)  # (B, T, H)


def _reverse_by_length(x, lengths):
    """Reverse (B, T, ...) within per-sample valid length."""
    B, T = x.shape[:2]
    t = jnp.arange(T)[None, :]
    idx = jnp.where(t < lengths[:, None], lengths[:, None] - 1 - t, t)
    return jnp.take_along_axis(x, idx.reshape(idx.shape + (1,) * (x.ndim - 2)), axis=1)


class LSTM(nn.Module):
    """(Stacked, optionally bidirectional) LSTM with torch parameter shapes.

    ``lengths=None`` runs the plain unpacked LSTM over all T steps (the
    reference applies TemporalDifference's LSTMs to padded inputs without
    packing, BANlib/model.py:205-210 — parity requires the unmasked path).
    """

    hidden_dim: int
    num_layers: int = 1
    bidirectional: bool = True

    @nn.compact
    def __call__(self, x, lengths: Optional[jnp.ndarray] = None):
        B, T, _ = x.shape
        mask = None
        if lengths is not None:
            mask = (jnp.arange(T)[None, :] < lengths[:, None]).astype(x.dtype)

        out = x
        for layer in range(self.num_layers):
            D = out.shape[-1]
            H = self.hidden_dim

            def mk(name, shape, fan):
                bound = 1.0 / math.sqrt(self.hidden_dim)
                return self.param(
                    name,
                    lambda k, s: jax.random.uniform(k, s, jnp.float32, -bound, bound),
                    shape,
                )

            w_ih = mk(f"w_ih_l{layer}", (4 * H, D), D)
            w_hh = mk(f"w_hh_l{layer}", (4 * H, H), H)
            b_ih = mk(f"b_ih_l{layer}", (4 * H,), H)
            b_hh = mk(f"b_hh_l{layer}", (4 * H,), H)
            fwd = _lstm_scan(out, mask, w_ih, w_hh, b_ih, b_hh)

            if self.bidirectional:
                w_ih_r = mk(f"w_ih_l{layer}_reverse", (4 * H, D), D)
                w_hh_r = mk(f"w_hh_l{layer}_reverse", (4 * H, H), H)
                b_ih_r = mk(f"b_ih_l{layer}_reverse", (4 * H,), H)
                b_hh_r = mk(f"b_hh_l{layer}_reverse", (4 * H,), H)
                if lengths is not None:
                    rev_in = _reverse_by_length(out, lengths)
                    rev = _lstm_scan(rev_in, mask, w_ih_r, w_hh_r, b_ih_r, b_hh_r)
                    bwd = _reverse_by_length(rev, lengths)
                else:
                    rev = _lstm_scan(out[:, ::-1], None, w_ih_r, w_hh_r, b_ih_r, b_hh_r)
                    bwd = rev[:, ::-1]
                out = jnp.concatenate([fwd, bwd], axis=-1)
            else:
                out = fwd
        return out


def masked_mean(x, lengths):
    """Mean over valid time steps (reference q_vector/v_vector loops,
    BANlib/model.py:46-53,76-84)."""
    T = x.shape[1]
    mask = (jnp.arange(T)[None, :] < lengths[:, None]).astype(x.dtype)
    return jnp.sum(x * mask[..., None], axis=1) / jnp.maximum(lengths[:, None], 1).astype(x.dtype)
