"""Sparse-table windowed maxima vs direct reduce_window (ops/windowed.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vmrframe_tpu.models.ban import _mask_meta, segment_max_map
from vmrframe_tpu.models.cca import cca_strided_mask_meta, strided_segment_max_map
from vmrframe_tpu.ops.windowed import all_windowed_maxes, pow2_window_maxes, windowed_max


def _direct_window_max(x, n):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        window_dimensions=(1, n, 1), window_strides=(1, 1, 1), padding="VALID")


@pytest.mark.parametrize("n", [1, 2, 3, 5, 8, 13, 31, 48, 64])
def test_windowed_max_matches_reduce_window(n):
    rng = np.random.default_rng(n)
    x = jnp.asarray(rng.normal(size=(2, 64, 5)).astype(np.float32))
    pow2 = pow2_window_maxes(x, n)
    got = windowed_max(pow2, n)
    want = _direct_window_max(x, n)
    assert got.shape == want.shape
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_all_windowed_maxes_shared_tables():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(3, 100, 4)).astype(np.float32))
    lengths = [2, 2, 7, 16, 33, 96]
    wins = all_windowed_maxes(x, lengths)
    assert set(wins) == set(lengths)
    for n in set(lengths):
        np.testing.assert_array_equal(np.asarray(wins[n]),
                                      np.asarray(_direct_window_max(x, n)))


def test_segment_max_map_values_unchanged():
    """The BAN map builder still produces the reference max-pool-chain values
    (BANlib/model.py:257-290) after the sparse-table rewrite."""
    rng = np.random.default_rng(1)
    L = 48
    x = jnp.asarray(rng.normal(size=(2, L, 6)).astype(np.float32))
    _, offsets, _, _ = _mask_meta([15, 8, 8], L)
    got = segment_max_map(x, list(offsets))
    xa = np.asarray(x)
    for o in offsets:
        for i in range(L - o):
            np.testing.assert_array_equal(
                np.asarray(got[:, i, i + o, :]), xa[:, i:i + o + 1, :].max(axis=1))
    # diagonal
    for i in range(L):
        np.testing.assert_array_equal(np.asarray(got[:, i, i, :]), xa[:, i, :])


def test_strided_segment_max_map_values_unchanged():
    rng = np.random.default_rng(2)
    L = 64
    x = jnp.asarray(rng.normal(size=(2, L, 3)).astype(np.float32))
    mask, cells = cca_strided_mask_meta([15, 8, 8], L)
    got = strided_segment_max_map(x, cells)
    xa = np.asarray(x)
    for o, s in cells:
        for i in range(0, L - o, s):
            np.testing.assert_array_equal(
                np.asarray(got[:, i, i + o, :]), xa[:, i:i + o + 1, :].max(axis=1))


def test_cell_gather_map_matches_scatter_fwd_and_grad():
    """The one-gather map assembly is bit-exact vs the scatter chain, in both
    the forward values AND the gradient wrt x (custom-VJP gather transpose)."""
    rng = np.random.default_rng(3)
    L = 64
    x = jnp.asarray(rng.normal(size=(2, L, 3)).astype(np.float32))
    _, cells = cca_strided_mask_meta([15, 8, 8], L)
    w = jnp.asarray(rng.normal(size=(2, L, L, 3)).astype(np.float32))

    np.testing.assert_array_equal(
        np.asarray(strided_segment_max_map(x, cells, impl="gather")),
        np.asarray(strided_segment_max_map(x, cells, impl="scatter")))

    def loss(impl):
        return lambda x_: jnp.sum(strided_segment_max_map(x_, cells, impl=impl) * w)

    g_gather = jax.jit(jax.grad(loss("gather")))(x)
    g_scatter = jax.jit(jax.grad(loss("scatter")))(x)
    # fp summation order differs between the two formulations' backwards
    np.testing.assert_allclose(np.asarray(g_gather), np.asarray(g_scatter),
                               rtol=1e-5, atol=1e-5)


def test_cell_gather_map_invalid_cells_zero():
    from vmrframe_tpu.ops.windowed import cell_segment_max_map

    rng = np.random.default_rng(4)
    L = 32
    x = jnp.asarray(rng.normal(size=(1, L, 2)).astype(np.float32) + 5.0)  # positive
    mask, cells = cca_strided_mask_meta([7, 4], L)
    got = np.asarray(cell_segment_max_map(x, cells))
    assert (got[:, ~mask, :] == 0.0).all()
    assert (got[:, mask, :] > 0.0).all()
