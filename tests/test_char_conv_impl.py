"""CharacterEmbedding's two formulations (windows matmul vs merged single
conv) are the same (s, d) contraction — outputs must match to float
tolerance from identical params, so the per-mode auto-routing cannot change
the model."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vmrframe_tpu.layers.basic import CharacterEmbedding

pytestmark = pytest.mark.quick


@pytest.mark.parametrize("C", [16, 7])
def test_windows_and_conv_paths_agree(C, monkeypatch):
    B, W = 4, 9
    ids = np.random.RandomState(0).randint(0, 24, size=(B, W, C))
    ids[0, 0, C // 2 :] = 0  # PAD tail exercises the padding_idx mask
    mod = CharacterEmbedding(num_chars=24, char_dim=100, droprate=0.0)
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(ids), True)

    outs = {}
    for impl in ("windows", "conv"):
        monkeypatch.setenv("VMR_CHAR_CONV", impl)
        # deterministic=False so "conv" would be the auto pick too; droprate
        # 0 keeps the comparison exact
        outs[impl] = np.asarray(
            mod.apply(variables, jnp.asarray(ids), False,
                      rngs={"dropout": jax.random.PRNGKey(1)}))
    np.testing.assert_allclose(outs["windows"], outs["conv"], atol=2e-5, rtol=1e-5)


def test_grads_agree(monkeypatch):
    B, W, C = 2, 5, 12
    ids = np.random.RandomState(1).randint(1, 24, size=(B, W, C))
    mod = CharacterEmbedding(num_chars=24, char_dim=100, droprate=0.0)
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(ids), True)

    grads = {}
    for impl in ("windows", "conv"):
        monkeypatch.setenv("VMR_CHAR_CONV", impl)

        def loss(params):
            out = mod.apply({"params": params}, jnp.asarray(ids), False,
                            rngs={"dropout": jax.random.PRNGKey(1)})
            return jnp.sum(out * out)

        grads[impl] = jax.grad(loss)(variables["params"])
    flat_w = jax.tree_util.tree_leaves(grads["windows"])
    flat_c = jax.tree_util.tree_leaves(grads["conv"])
    for a, b in zip(flat_w, flat_c):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-4, rtol=2e-4)
