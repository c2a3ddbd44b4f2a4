"""CPL GaussMultiheadAttention vs a functional torch oracle — the
post-softmax Gaussian proposal reweighting + causal/pad masking
(reference cpl_lib.py:56-216)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from vmrframe_tpu.layers.cpl_decoder import GaussMultiheadAttention


def test_gauss_mha_matches_torch():
    rng = np.random.default_rng(0)
    B, Tq, Tk, E, H = 2, 6, 10, 8, 2
    q = rng.standard_normal((B, Tq, E)).astype(np.float32)
    kv = rng.standard_normal((B, Tk, E)).astype(np.float32)
    pad = np.zeros((B, Tk), np.float32)
    pad[:, 8:] = 1.0  # 1 = PAD
    gauss = rng.random((B, Tk)).astype(np.float32) + 0.1

    mod = GaussMultiheadAttention(E, H)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(q), jnp.asarray(kv), jnp.asarray(kv),
                      jnp.asarray(pad), None, jnp.asarray(gauss))["params"]
    got, got_w = mod.apply({"params": params}, jnp.asarray(q), jnp.asarray(kv), jnp.asarray(kv),
                           jnp.asarray(pad), None, jnp.asarray(gauss))

    W = torch.tensor(np.asarray(params["in_proj_weight"]))
    b = torch.tensor(np.asarray(params["in_proj_bias"]))
    tq, tkv = torch.tensor(q), torch.tensor(kv)
    Q = tq @ W[:E].T + b[:E]
    K = tkv @ W[E:2 * E].T + b[E:2 * E]
    V = tkv @ W[2 * E:].T + b[2 * E:]
    hd = E // H
    sh = lambda t: t.reshape(B, -1, H, hd).permute(0, 2, 1, 3)
    att = (sh(Q) * (hd ** -0.5)) @ sh(K).transpose(-1, -2)
    att = att.masked_fill(torch.tensor(pad)[:, None, None, :] == 1, -1e30)
    att = torch.softmax(att, dim=-1)
    gw = torch.tensor(gauss)[:, None, None, :]
    att = att * (gw + 1e-10)
    att = att / att.sum(dim=-1, keepdim=True)
    out = (att @ sh(V)).permute(0, 2, 1, 3).reshape(B, Tq, E)
    out = out @ torch.tensor(np.asarray(params["out_proj_kernel"])) + \
        torch.tensor(np.asarray(params["out_proj_bias"]))

    np.testing.assert_allclose(np.asarray(got), out.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_w), att.mean(dim=1).numpy(), atol=1e-5)


def test_causal_mask_blocks_future():
    rng = np.random.default_rng(1)
    B, T, E, H = 1, 5, 8, 2
    x = rng.standard_normal((B, T, E)).astype(np.float32)
    attn_mask = jnp.triu(jnp.full((T, T), -jnp.inf), k=1)
    mod = GaussMultiheadAttention(E, H)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(x), jnp.asarray(x),
                      None, attn_mask, None)
    out1, _ = mod.apply(params, jnp.asarray(x), jnp.asarray(x), jnp.asarray(x), None, attn_mask, None)
    # perturbing the FUTURE must not change earlier outputs
    x2 = x.copy()
    x2[0, 4] += 100.0
    out2, _ = mod.apply(params, jnp.asarray(x2), jnp.asarray(x2), jnp.asarray(x2), None, attn_mask, None)
    np.testing.assert_allclose(np.asarray(out1)[0, :4], np.asarray(out2)[0, :4], atol=1e-5)
