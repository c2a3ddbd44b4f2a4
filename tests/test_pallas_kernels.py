"""Pallas attention kernels vs the jnp reference path (interpret mode on CPU)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vmrframe_tpu.kernels.attention import fused_dual_attention, fused_masked_attention


def _ref_attention(q, k, v, mask):
    hd = q.shape[-1]
    scores = jnp.einsum("bhld,bhmd->bhlm", q, k) / math.sqrt(hd)
    scores = scores + (1.0 - mask[:, None]) * -1e30
    probs = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhlm,bhmd->bhld", probs, v)


@pytest.mark.parametrize("L,M", [(16, 16), (32, 8)])
def test_fused_masked_attention_matches_reference(L, M):
    rng = np.random.default_rng(0)
    B, H, hd = 2, 4, 8
    q = jnp.asarray(rng.standard_normal((B, H, L, hd)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, H, M, hd)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, H, M, hd)).astype(np.float32))
    mask = np.ones((B, L, M), np.float32)
    mask[:, :, M // 2 :] = 0.0
    mask = jnp.asarray(mask)
    got = fused_masked_attention(q, k, v, mask, interpret=True)
    want = _ref_attention(q, k, v, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_fused_dual_attention_matches_reference():
    rng = np.random.default_rng(1)
    B, H, L, M, hd = 2, 4, 16, 10, 8
    q = jnp.asarray(rng.standard_normal((B, H, L, hd)).astype(np.float32))
    fk = jnp.asarray(rng.standard_normal((B, H, L, hd)).astype(np.float32))
    fv = jnp.asarray(rng.standard_normal((B, H, L, hd)).astype(np.float32))
    tk = jnp.asarray(rng.standard_normal((B, H, M, hd)).astype(np.float32))
    tv = jnp.asarray(rng.standard_normal((B, H, M, hd)).astype(np.float32))
    smask = np.ones((B, L, L), np.float32)
    smask[:, :, L - 4 :] = 0.0
    xmask = np.ones((B, L, M), np.float32)
    xmask[:, :, M - 3 :] = 0.0
    smask, xmask = jnp.asarray(smask), jnp.asarray(xmask)
    s_got, x_got = fused_dual_attention(q, fk, fv, tk, tv, smask, xmask, interpret=True)
    np.testing.assert_allclose(np.asarray(s_got), np.asarray(_ref_attention(q, fk, fv, smask)),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(x_got), np.asarray(_ref_attention(q, tk, tv, xmask)),
                               atol=1e-5)
