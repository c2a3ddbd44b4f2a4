"""Banded (sliding-window) Pallas attention kernel vs the XLA band-mask
path — forward and gradients (interpret mode on CPU)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vmrframe_tpu.kernels.window_attention import banded_attention


def xla_band_attention(q, k, v, kv_mask, window):
    """The exact math MaskedMHCA computes for window_size > 0
    (vmrframe_tpu/layers/actionformer.py:140-162), without the conv/LN."""
    B, H, T, hd = q.shape
    att = jnp.einsum("bhqd,bhkd->bhqk", q / np.sqrt(hd), k)
    neg = jnp.finfo(att.dtype).min
    att = jnp.where(kv_mask[:, None, None, :] > 0, att, neg)
    qi = jnp.arange(T)[:, None]
    kj = jnp.arange(T)[None, :]
    att = jnp.where((jnp.abs(qi - kj) <= window // 2)[None, None], att, neg)
    p = jax.nn.softmax(att, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v * kv_mask[:, None, :, None])


@pytest.mark.parametrize("T,window", [(512, 19), (512, 9), (640, 37), (384, 5)])
def test_banded_forward_matches_xla(T, window):
    rng = np.random.default_rng(0)
    B, H, hd = 2, 2, 32
    q = rng.normal(size=(B, H, T, hd)).astype(np.float32)
    k = rng.normal(size=(B, H, T, hd)).astype(np.float32)
    v = rng.normal(size=(B, H, T, hd)).astype(np.float32)
    lens = np.array([T, T - 100])
    kv_mask = (np.arange(T)[None] < lens[:, None]).astype(np.float32)

    got = banded_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                           jnp.asarray(kv_mask), window, interpret=True)
    want = xla_band_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                              jnp.asarray(kv_mask), window)
    # compare on valid QUERY rows (like MaskedMHCA, callers mask the rest)
    m = kv_mask[:, None, :, None]
    np.testing.assert_allclose(np.asarray(got) * m, np.asarray(want) * m,
                               atol=2e-5, rtol=1e-5)


def test_banded_gradients_match_xla():
    rng = np.random.default_rng(1)
    B, H, T, hd, window = 1, 2, 384, 16, 19
    q = rng.normal(size=(B, H, T, hd)).astype(np.float32)
    k = rng.normal(size=(B, H, T, hd)).astype(np.float32)
    v = rng.normal(size=(B, H, T, hd)).astype(np.float32)
    lens = np.array([T - 50])
    kv_mask = jnp.asarray((np.arange(T)[None] < lens[:, None]).astype(np.float32))
    # downstream weights: only valid query rows contribute (like MaskedMHCA's
    # output masking)
    w = jnp.asarray(rng.normal(size=(B, H, T, hd)).astype(np.float32)) \
        * kv_mask[:, None, :, None]

    def loss_kernel(q, k, v):
        out = banded_attention(q, k, v, kv_mask, window, interpret=True)
        return jnp.sum(out * w)

    def loss_xla(q, k, v):
        out = xla_band_attention(q, k, v, kv_mask, window)
        return jnp.sum(out * w)

    gk = jax.grad(loss_kernel, argnums=(0, 1, 2))(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    for a, b, name in zip(gk, gx, ("dq", "dk", "dv")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5, rtol=1e-4,
                                   err_msg=f"{name} diverges from the XLA band path")
