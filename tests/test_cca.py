import os

import jax
import numpy as np
import pytest

from vmrframe_tpu.config import Derived, load_config
from vmrframe_tpu.data.cca_batcher import CCABatcher
from vmrframe_tpu.testing import make_synthetic_data
from vmrframe_tpu.train.trainer import Trainer


@pytest.fixture(scope="module")
def cca_cfg():
    return load_config(os.path.join(os.path.dirname(__file__), "configs", "anet_cca.yaml"))


def test_strided_mask_and_map():
    import jax.numpy as jnp

    from vmrframe_tpu.models.cca import cca_strided_mask_meta, strided_segment_max_map

    L = 16
    mask, cells = cca_strided_mask_meta([4, 2, 2], L)
    assert mask[0, 0] and mask[0, 1]
    # stage-2 diagonals only exist at even starts
    offs = [o for o, s in cells if s == 2]
    assert offs, "expected stride-2 diagonals"
    o = offs[0]
    assert mask[0, o] and not mask[1, 1 + o]

    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, L, 3)).astype(np.float32)
    m = np.asarray(strided_segment_max_map(jnp.asarray(x), cells))
    ii, jj = np.nonzero(mask)
    for i, j in zip(ii, jj):
        np.testing.assert_allclose(m[0, i, j], x[0, i : j + 1].max(axis=0), atol=1e-6)


def test_concepts_synthetic_fallback(cca_cfg):
    from vmrframe_tpu.data.concepts import load_concepts

    embs, adj = load_concepts(cca_cfg, word_dim=cca_cfg.INPUT.PRE_QUERY_SIZE)
    assert embs.shape == (24, 50)
    assert adj.shape == (24, 24)
    # deterministic across calls
    embs2, adj2 = load_concepts(cca_cfg, word_dim=cca_cfg.INPUT.PRE_QUERY_SIZE)
    np.testing.assert_array_equal(embs, embs2)


def test_cca_trains_with_batchnorm_state(cca_cfg):
    dataset, store = make_synthetic_data(cca_cfg, seed=0, n_train=16, n_test=8)
    derived = Derived(num_words=dataset["n_words"], num_chars=dataset["n_chars"],
                      num_train_steps=4, steps_per_epoch=2)
    train_b = CCABatcher(dataset["train_set"], store, cca_cfg, derived, "train")
    test_b = CCABatcher(dataset["test_set"], store, cca_cfg, derived, "test")
    trainer = Trainer(cca_cfg, derived, dataset["word_vector"])
    rng = jax.random.PRNGKey(0)
    state = trainer.init_state(rng, next(train_b.epoch(seed=0)))
    assert "batch_stats" in state.constants  # BN running stats tracked
    bn_before = jax.tree_util.tree_leaves(state.constants["batch_stats"])[0].copy()
    step = trainer.compiled_train_step()
    for batch in train_b.epoch(seed=0):
        state, m = step(state, trainer._shard_batch(batch), rng)
        assert np.isfinite(float(m["loss"]))
    bn_after = jax.tree_util.tree_leaves(state.constants["batch_stats"])[0]
    assert not np.allclose(np.asarray(bn_before), np.asarray(bn_after)), "BN stats must update"
    ious1, _, _ = trainer.run_eval_epoch(state, test_b.epoch(seed=0))
    ious2, _, _ = trainer.run_eval_epoch(state, test_b.epoch(seed=0))
    np.testing.assert_allclose(ious1, ious2, atol=1e-6)


def test_scores_knob_paths_agree_full_model(cca_cfg):
    """others.cca_contraction_scores gates two EXACT formulations of the
    cosine scores (contraction einsums vs broadcast product + l2norm); the
    full CCA forward must produce the same scores2d under both, in train
    mode (where "eval"-default now routes to the product form — the
    contraction backward measured a 1.5x on-chip train regression,
    docs/BENCH_ZOO.json CCA_contract)."""
    from vmrframe_tpu.models.cca import CCA

    dataset, store = make_synthetic_data(cca_cfg, seed=0, n_train=4, n_test=2)
    derived = Derived(num_words=dataset["n_words"], num_chars=dataset["n_chars"],
                      num_train_steps=2, steps_per_epoch=1)
    batch = next(CCABatcher(dataset["train_set"], store, cca_cfg, derived,
                            "train").epoch(seed=0, shuffle=False))
    rng = jax.random.PRNGKey(0)
    outs = {}
    for mode in ("always", "never"):
        cfg = cca_cfg.updated({"others.cca_contraction_scores": mode})
        model = CCA(cfg=cfg, derived=derived, word_vectors=dataset["word_vector"])
        variables = model.init({"params": rng, "dropout": rng}, batch, True)
        out, _ = model.apply(variables, batch, False,
                             rngs={"dropout": jax.random.PRNGKey(7)},
                             mutable=["batch_stats"])
        outs[mode] = np.asarray(out["scores2d"])
    np.testing.assert_allclose(outs["always"], outs["never"],
                               atol=2e-4, rtol=2e-4)


def test_scores_contraction_matches_normalize_then_sum():
    """models/cca.py::scores computes sum_h F.normalize(q*m) as two
    H-contractions (the (B,L,L,H) product never materializes); pin it
    against the reference's naive normalize-then-sum (CCA.py:366-374),
    including exactly-zero cells where the eps clamp engages."""
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    B, L, H = 3, 8, 12
    q = rng.standard_normal((B, H)).astype(np.float32)
    m = rng.standard_normal((B, L, L, H)).astype(np.float32)
    m[0, 2, 3] = 0.0  # invalid map cell: prod == 0, clamp path
    m[1] *= 1e-6      # tiny-norm cells near the clamp boundary

    def naive(q, m):
        prod = q[:, None, None, :] * m
        sq = np.sum(prod * prod, axis=-1, keepdims=True)
        unit = prod / np.sqrt(np.maximum(sq, 1e-24))
        return np.sum(unit, axis=-1)

    eps = 1e-12
    num = jnp.einsum("bh,bijh->bij", q, m)
    den = jnp.sqrt(jnp.maximum(
        jnp.einsum("bh,bijh->bij", jnp.square(q), jnp.square(m)), eps * eps))
    got = np.asarray(num / den)
    np.testing.assert_allclose(got, naive(q, m), atol=1e-5, rtol=1e-5)


def test_cosine_sum_scores_custom_vjp_matches_autodiff():
    """cosine_sum_scores' hand-derived backward (dm one fused pass, dq two
    H-contractions) must equal autodiff of the product form — including at
    exactly-zero map cells where the eps clamp's gradient is cut."""
    import jax.numpy as jnp

    from vmrframe_tpu.models.cca import cosine_sum_scores, l2norm

    rng = np.random.default_rng(1)
    B, L, H = 2, 6, 10
    q = jnp.asarray(rng.standard_normal((B, H)).astype(np.float32))
    m_np = rng.standard_normal((B, L, L, H)).astype(np.float32)
    m_np[0, 1, 4] = 0.0  # invalid cell: clamped branch
    m = jnp.asarray(m_np)
    g_np = rng.standard_normal((B, L, L)).astype(np.float32)
    # the CCA loss masks invalid cells, so their cotangent is 0 — mirror
    # that here (with g != 0 both forms give the same huge g*q/eps value,
    # but that's not a regime the model reaches)
    g_np[0, 1, 4] = 0.0
    g = jnp.asarray(g_np)

    def product_form(q, m):
        return jnp.sum(l2norm(q[:, None, None, :] * m), axis=-1)

    np.testing.assert_allclose(np.asarray(cosine_sum_scores(q, m)),
                               np.asarray(product_form(q, m)), atol=1e-5, rtol=1e-5)

    def wrap(fn):
        return lambda q_, m_: jnp.sum(fn(q_, m_) * g)

    dq_got, dm_got = jax.grad(wrap(cosine_sum_scores), argnums=(0, 1))(q, m)
    dq_want, dm_want = jax.grad(wrap(product_form), argnums=(0, 1))(q, m)
    np.testing.assert_allclose(np.asarray(dq_got), np.asarray(dq_want),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(dm_got), np.asarray(dm_want),
                               atol=1e-4, rtol=1e-4)
    # the clamped cell passes no gradient in either formulation
    assert np.allclose(np.asarray(dm_got)[0, 1, 4], 0.0)
