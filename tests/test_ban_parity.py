"""BAN-specific math vs torch oracles: the CQAttention variant (unmasked
column softmax + scalar bias, BANlib/model.py:104-142) and the temporal
difference signal (BANlib/model.py:145-160)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from vmrframe_tpu.models.ban import BANCQAttention, TemporalDifference


def test_ban_cqattention_matches_torch():
    rng = np.random.default_rng(0)
    B, Lc, Lq, D = 2, 8, 5, 6
    C = rng.standard_normal((B, Lc, D)).astype(np.float32)
    Q = rng.standard_normal((B, Lq, D)).astype(np.float32)
    qmask = np.ones((B, Lq), np.float32)
    qmask[:, 4:] = 0.0

    mod = BANCQAttention(D, dropout=0.0)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(C), jnp.asarray(Q), jnp.asarray(qmask))
    got = np.asarray(mod.apply(params, jnp.asarray(C), jnp.asarray(Q), jnp.asarray(qmask)))

    p = jax.tree_util.tree_map(np.asarray, params["params"])
    tC, tQ = torch.tensor(C), torch.tensor(Q)
    s0 = tC @ torch.tensor(p["w4C"])
    s1 = (tQ @ torch.tensor(p["w4Q"])).transpose(1, 2)
    s2 = (tC * torch.tensor(p["w4mlu"])) @ tQ.transpose(1, 2)
    S = s0 + s1 + s2 + torch.tensor(p["bias"])
    S1 = torch.softmax(S + (1 - torch.tensor(qmask)).unsqueeze(1) * -1e30, dim=2)
    S2 = torch.softmax(S, dim=1)  # the reference's UNMASKED column softmax
    A = S1 @ tQ
    Bt = (S1 @ S2.transpose(1, 2)) @ tC
    want = torch.cat([tC, A, tC * A, tC * Bt], dim=2).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_temporal_difference_signal():
    """td = sum over channels of squared forward+backward differences with
    replicate-padded ends."""
    rng = np.random.default_rng(1)
    B, T, D = 2, 6, 4
    x = rng.standard_normal((B, T, 2 * D)).astype(np.float32)
    mod = TemporalDifference(split_dim=D, droprate=0.0, layer_num=1)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    hb, hc, td = mod.apply(params, jnp.asarray(x))
    hb = np.asarray(hb)
    right = np.concatenate([hb[:, 1:], hb[:, -1:]], axis=1) - hb
    left = np.concatenate([hb[:, :1], hb[:, :-1]], axis=1) - hb
    want = (right**2 + left**2).sum(-1)
    np.testing.assert_allclose(np.asarray(td), want, atol=1e-5)
    # boundary terms: one-sided diffs vanish at the replicated ends
    assert np.allclose(np.asarray(td)[:, 0],
                       ((hb[:, 1] - hb[:, 0]) ** 2).sum(-1), atol=1e-5)
