"""MaskedMHCA (ActionFormer conv attention) vs a functional torch oracle
driven by our params — covers the strided depthwise convs, channel-LN and
masked attention layouts of the second-biggest model family."""

import math
import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from vmrframe_tpu.layers.actionformer import MaskedMHCA


def _chan_ln(x, p, eps=1e-5):
    mu = x.mean(-1, keepdim=True)
    var = ((x - mu) ** 2).mean(-1, keepdim=True)
    return (x - mu) / torch.sqrt(var + eps) * torch.tensor(np.asarray(p["weight"])) + \
        torch.tensor(np.asarray(p["bias"]))


def _masked_dwconv(x, mask, p, stride):
    # flax kernel (k, 1, C) -> torch (C, 1, k); SAME padding for odd k
    w = torch.tensor(np.asarray(p["conv"]["kernel"])).permute(2, 1, 0)
    k = w.shape[-1]
    y = torch.nn.functional.conv1d(x.transpose(1, 2), w, stride=stride,
                                   padding=k // 2, groups=x.shape[-1]).transpose(1, 2)
    out_mask = mask[:, ::stride] if stride > 1 else mask
    return y * out_mask.unsqueeze(-1), out_mask


def _dense(x, p):
    return x @ torch.tensor(np.asarray(p["kernel"])) + torch.tensor(np.asarray(p["bias"]))


@pytest.mark.parametrize("stride,window", [(1, -1), (2, -1), (1, 5)])
def test_masked_mhca_matches_torch(stride, window):
    rng = np.random.default_rng(0)
    B, T, C, H = 2, 16, 8, 2
    x = rng.standard_normal((B, T, C)).astype(np.float32)
    mask_np = np.ones((B, T), np.float32)
    mask_np[:, 12:] = 0.0

    mod = MaskedMHCA(C, H, n_qx_stride=stride, n_kv_stride=stride, window_size=window)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(mask_np))["params"]
    got, got_mask = mod.apply({"params": params}, jnp.asarray(x), jnp.asarray(mask_np))

    tx, tmask = torch.tensor(x), torch.tensor(mask_np)
    # MaskedConv1D masks the OUTPUT only (reference blocks.py:44-59)
    q, qx_mask = _masked_dwconv(tx, tmask, params["query_conv"], stride)
    q = _chan_ln(q, params["query_norm"])
    k, kv_mask = _masked_dwconv(tx, tmask, params["key_conv"], stride)
    k = _chan_ln(k, params["key_norm"])
    v, _ = _masked_dwconv(tx, tmask, params["value_conv"], stride)
    v = _chan_ln(v, params["value_norm"])
    q, k, v = _dense(q, params["query"]), _dense(k, params["key"]), _dense(v, params["value"])

    hd = C // H
    sh = lambda t: t.reshape(B, -1, H, hd).permute(0, 2, 1, 3)
    att = sh(q) @ sh(k).transpose(-1, -2) / math.sqrt(hd)
    neg = torch.finfo(att.dtype).min
    att = att.masked_fill(kv_mask[:, None, None, :] == 0, neg)
    if window > 0:
        Tq = q.shape[1]
        qi = torch.arange(Tq)[:, None]
        kj = torch.arange(k.shape[1])[None, :]
        att = att.masked_fill(((qi - kj).abs() > window // 2)[None, None], neg)
    probs = torch.softmax(att, dim=-1)
    out = probs @ sh(v * kv_mask.unsqueeze(-1))
    out = out.permute(0, 2, 1, 3).reshape(B, -1, C)
    out = _dense(out, params["proj"]) * qx_mask.unsqueeze(-1)

    np.testing.assert_allclose(np.asarray(got_mask), qx_mask.numpy(), atol=0)
    np.testing.assert_allclose(np.asarray(got), out.numpy(), atol=1e-4)
