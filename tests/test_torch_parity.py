"""Numerical parity of layout-sensitive layers against torch oracles built
from OUR parameters (validates the exact conventions the checkpoint
converter relies on, at the ≤1e-4 fidelity target)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from vmrframe_tpu.layers.basic import CharacterEmbedding, DepthwiseSeparableConvBlock


def test_depthwise_separable_conv_block_matches_torch():
    rng = np.random.default_rng(0)
    B, L, D, K = 2, 12, 8, 7
    x = rng.standard_normal((B, L, D)).astype(np.float32)
    mod = DepthwiseSeparableConvBlock(dim=D, kernel_size=K, num_layers=2, droprate=0.0)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    got = np.asarray(mod.apply({"params": params}, jnp.asarray(x)))

    # torch twin driven by OUR params through the converter's inverse layout
    out = torch.tensor(x)
    for i in range(2):
        ln = torch.nn.LayerNorm(D, eps=1e-6)
        ln.weight.data = torch.tensor(np.asarray(params[f"layer_norm_{i}"]["scale"]))
        ln.bias.data = torch.tensor(np.asarray(params[f"layer_norm_{i}"]["bias"]))
        dw = torch.nn.Conv1d(D, D, K, groups=D, padding=K // 2, bias=False)
        # flax (K, 1, D) -> torch (D, 1, K)
        dw.weight.data = torch.tensor(
            np.asarray(params[f"depthwise_{i}"]["kernel"]).transpose(2, 1, 0))
        pw = torch.nn.Conv1d(D, D, 1, bias=True)
        pw.weight.data = torch.tensor(np.asarray(params[f"pointwise_{i}"]["kernel"]).T[:, :, None])
        pw.bias.data = torch.tensor(np.asarray(params[f"pointwise_{i}"]["bias"]))
        residual = out
        h = ln(out).transpose(1, 2)
        h = torch.relu(pw(dw(h)))
        out = h.transpose(1, 2) + residual
    np.testing.assert_allclose(got, out.detach().numpy(), atol=1e-4)


def test_character_embedding_matches_torch():
    rng = np.random.default_rng(1)
    B, W, C, cd = 2, 5, 6, 8
    ids = rng.integers(0, 20, (B, W, C)).astype(np.int32)
    ids[0, 0, 3:] = 0  # padded chars
    mod = CharacterEmbedding(num_chars=20, char_dim=cd, droprate=0.0)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(ids))["params"]
    got = np.asarray(mod.apply({"params": params}, jnp.asarray(ids)))

    table = np.asarray(params["char_table"]).copy()
    table[0] = 0.0  # torch padding_idx=0 zeroes the row
    emb = torch.nn.functional.embedding(torch.tensor(ids, dtype=torch.long), torch.tensor(table))
    emb = emb.permute(0, 3, 1, 2)  # (B, cd, W, C)
    outs = []
    for k, ch in zip((1, 2, 3, 4), (10, 20, 30, 40)):
        conv = torch.nn.Conv2d(cd, ch, (1, k), bias=True)
        # flax (k, cd, ch) -> torch (ch, cd, 1, k)
        conv.weight.data = torch.tensor(
            np.asarray(params[f"conv_k{k}"]["kernel"]).transpose(2, 1, 0)[:, :, None, :])
        conv.bias.data = torch.tensor(np.asarray(params[f"conv_k{k}"]["bias"]))
        y = torch.relu(conv(emb))
        outs.append(y.max(dim=3).values)  # (B, ch, W)
    want = torch.cat(outs, dim=1).permute(0, 2, 1).detach().numpy()
    np.testing.assert_allclose(got, want, atol=1e-4)
