"""CCA concept-fusion attention vs a torch oracle (models/CCA.py:299-329):
single-head attention of the query vector over the concept basis with a x10
temperature and an l2-normalized residual."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from vmrframe_tpu.models.cca import FuseAttention, ConceptGCN


def test_fuse_attention_matches_torch():
    rng = np.random.default_rng(0)
    B, D, A, C = 3, 8, 12, 8
    feat = rng.standard_normal((B, D)).astype(np.float32)
    concept = rng.standard_normal((A, C)).astype(np.float32)

    mod = FuseAttention(hidden_dim=D, concept_dim=C)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(feat), jnp.asarray(concept))
    got = np.asarray(mod.apply(params, jnp.asarray(feat), jnp.asarray(concept)))

    p = jax.tree_util.tree_map(np.asarray, params["params"])
    lin = lambda x, q: x @ torch.tensor(q["kernel"]) + torch.tensor(q["bias"])
    tf, tc = torch.tensor(feat), torch.tensor(concept)
    scores = torch.softmax((lin(tf, p["query"]) @ lin(tc, p["key"]).T) * 10.0, dim=1)
    out = scores @ lin(tc, p["value"]) + tf
    want = (out / torch.clamp(out.norm(dim=-1, keepdim=True), min=1e-12)).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_concept_gcn_l2norm_rows():
    rng = np.random.default_rng(1)
    A, E = 10, 8
    adj = np.abs(rng.standard_normal((A, A))).astype(np.float32) + np.eye(A, dtype=np.float32)
    embs = rng.standard_normal((A, 16)).astype(np.float32)
    mod = ConceptGCN(embed_size=E, adj=adj, concept_embs=embs)
    variables = mod.init(jax.random.PRNGKey(0))
    basis = np.asarray(mod.apply(variables))
    assert basis.shape == (A, E)
    np.testing.assert_allclose(np.linalg.norm(basis, axis=1), np.ones(A), atol=1e-4)
