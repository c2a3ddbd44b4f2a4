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

import functools
from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


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


# ---------------------------------------------------------------------------
# One-gather 2D-map assembly.
#
# The first formulation of the (B, L, L, D) proposal maps scattered each
# diagonal into the map with `.at[:, i, i + o, :].set(...)` — one full-map
# update per offset.  In a TRAIN step every one of those updates becomes its
# own full-map select fusion (it must survive for the backward), which the
# round-5 CCA train trace measured at ~26 ms of a 57 ms step: 28 scatter
# fusions x ~650 us plus a 7.8 ms fused scatter-chain backward, all at
# ~340 GB/s (docs/TRACE_CCA_TRAIN.json, docs/ROOFLINE_TRACE_TRAIN.json).
#
# This formulation stacks every diagonal's window-max rows into ONE
# (B, R, D) tensor and materializes the map with a single static gather.
# Each stacked row feeds at most one map cell (offsets are distinct, so
# (width, start) pairs are unique), which makes the gather a
# padding-permutation: its transpose is another static gather, not a
# scatter-add — the custom VJP below keeps XLA from emitting one.
# Values are bit-exact vs the scatter formulation (same window maxima, same
# zeros elsewhere; no arithmetic is reordered).
# ---------------------------------------------------------------------------


def _cell_gather_meta(L: int, cells: Tuple[Tuple[int, int], ...]):
    """Static index tables for the one-gather map assembly.

    cells: ((offset, stride), ...) — cell (i, i+offset) for i in
    range(0, L-offset, stride) holds max(x[i .. i+offset]).  The diagonal
    (offset 0) is always included.  Returns (widths, idx, inv) where
    ``idx`` (L*L,) maps flat map cells to stacked-window rows (R = invalid /
    zeros) and ``inv`` (R,) maps rows back to flat map cells (L*L = unused).
    """
    widths = sorted({1} | {int(o) + 1 for o, _ in cells})
    base, r = {}, 0
    for w in widths:
        base[w] = r
        r += L - w + 1
    R = r
    idx = np.full((L, L), R, np.int32)
    ii = np.arange(L)
    idx[ii, ii] = base[1] + ii
    for o, s in cells:
        o, s = int(o), int(s)
        i = np.arange(0, L - o, s)
        idx[i, i + o] = base[o + 1] + i
    flat = idx.reshape(-1)
    pos = np.nonzero(flat < R)[0]
    assert len(np.unique(flat[pos])) == len(pos), "cells must be distinct"
    inv = np.full((R,), L * L, np.int32)
    inv[flat[pos]] = pos
    return widths, flat, inv


@functools.lru_cache(maxsize=None)
def _make_cell_gather(L: int, cells: Tuple[Tuple[int, int], ...]):
    widths, idx, inv = _cell_gather_meta(L, cells)

    @jax.custom_vjp
    def gather(rows):
        B, _, D = rows.shape
        padded = jnp.concatenate([rows, jnp.zeros((B, 1, D), rows.dtype)], axis=1)
        return jnp.take(padded, jnp.asarray(idx), axis=1).reshape(B, L, L, D)

    def fwd(rows):
        return gather(rows), ()

    def bwd(_, ct):
        B, D = ct.shape[0], ct.shape[-1]
        padded = jnp.concatenate(
            [ct.reshape(B, L * L, D), jnp.zeros((B, 1, D), ct.dtype)], axis=1)
        return (jnp.take(padded, jnp.asarray(inv), axis=1),)

    gather.defvjp(fwd, bwd)
    return gather, widths


def cell_segment_max_map(x: jnp.ndarray, cells) -> jnp.ndarray:
    """(B, L, D) -> (B, L, L, D) sparse proposal map, built as one gather.

    Exact same values as the scatter formulation (cell (i, i+o) =
    max(x[i..i+o]) for (o, stride) in ``cells``, x on the diagonal, zeros
    elsewhere) but one gather instead of len(cells) full-map scatters, and a
    gather — not a scatter-add — as its backward.
    """
    B, L, D = x.shape
    gather, widths = _make_cell_gather(L, tuple((int(o), int(s)) for o, s in cells))
    wins = all_windowed_maxes(x, widths)
    rows = jnp.concatenate([wins[w] for w in widths], axis=1)
    return gather(rows)
