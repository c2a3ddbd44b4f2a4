"""Sparse-table (doubling) windowed maxima for the sparse 2D proposal maps.

The reference builds its 2D maps with a chain of max-pools, one per diagonal
offset (BANlib/model.py:257-290, models/CCA.py:183-204) — O(window) work per
offset when each window is reduced independently.  The classic sparse-table
trick gets every window from just the log2(L) power-of-two window maxima:

    max(x[i .. i+n-1]) = max(pow2[j][i], pow2[j][i + n - 2**j]),  2**j <= n

so the whole offset set costs O(L·D·log L) plus two elementwise max ops per
offset — a strictly better fit for the TPU's VPU than per-offset reductions,
and the advantage grows with vlen (the long-video regime).
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax.numpy as jnp


def pow2_window_maxes(x: jnp.ndarray, max_window: int):
    """Power-of-two sliding maxima along axis 1.

    x: (B, L, D).  Returns [w0, w1, ...] where wj has shape
    (B, L - 2**j + 1, D) and wj[:, i] = max(x[:, i : i + 2**j]).
    """
    win = [x]
    j = 0
    while (2 << j) <= max_window:
        p = win[j]
        step = 1 << j
        win.append(jnp.maximum(p[:, : p.shape[1] - step], p[:, step:]))
        j += 1
    return win


def windowed_max(pow2, n: int) -> jnp.ndarray:
    """Sliding max of window length n from precomputed pow2 tables.

    Returns (B, L - n + 1, D): out[:, i] = max(x[:, i : i + n]).
    """
    n = int(n)
    if n == 1:
        return pow2[0]
    j = n.bit_length() - 1  # largest power of two <= n
    a = pow2[j]
    if (1 << j) == n:
        return a
    shift = n - (1 << j)
    return jnp.maximum(a[:, : a.shape[1] - shift], a[:, shift:])


def all_windowed_maxes(x: jnp.ndarray, lengths: Sequence[int]) -> Dict[int, jnp.ndarray]:
    """Sliding maxima for every window length in `lengths` (shared tables)."""
    if not lengths:
        return {}
    lengths = [int(n) for n in lengths]
    pow2 = pow2_window_maxes(x, max(lengths))
    return {n: windowed_max(pow2, n) for n in sorted(set(lengths))}
