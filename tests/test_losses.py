"""Loss parity vs torch oracles (torch CPU is available in the image)."""

import numpy as np
import pytest

import jax.numpy as jnp

from vmrframe_tpu.losses import lossfun_loc, lossfun_loc2d, lossfun_match, lossfun_softloc


def test_lossfun_loc_matches_torch_soft_ce():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    B, L = 8, 32
    slog = rng.standard_normal((B, L)).astype(np.float32)
    elog = rng.standard_normal((B, L)).astype(np.float32)
    slab = rng.random((B, L)).astype(np.float32)
    elab = rng.random((B, L)).astype(np.float32)
    got = float(lossfun_loc(jnp.asarray(slog), jnp.asarray(elog), jnp.asarray(slab),
                            jnp.asarray(elab), jnp.ones((B, L))))
    ce = torch.nn.CrossEntropyLoss(reduction="mean")
    want = float(ce(torch.tensor(slog), torch.tensor(slab)) + ce(torch.tensor(elog), torch.tensor(elab)))
    assert got == pytest.approx(want, abs=1e-4)


def test_lossfun_match_orthogonal_embs_zero_penalty():
    rng = np.random.default_rng(0)
    B, L = 4, 16
    probs = np.log(np.full((B, L, 4), 0.25, np.float32))
    labels = rng.integers(0, 4, (B, L))
    vmask = np.ones((B, L), np.float32)
    q, _ = np.linalg.qr(rng.standard_normal((32, 4)))
    got = float(lossfun_match(jnp.asarray(probs), jnp.asarray(q.astype(np.float32)),
                              jnp.asarray(labels), jnp.asarray(vmask)))
    # orthogonal label embs -> zero penalty; uniform probs -> -log(0.25)
    assert got == pytest.approx(-np.log(0.25), abs=1e-5)


def test_lossfun_match_respects_vmask():
    B, L = 2, 8
    probs = np.zeros((B, L, 4), np.float32)
    probs[:, :, 0] = -1.0  # nonzero NLL only where label==0
    labels = np.zeros((B, L), np.int64)
    vmask = np.zeros((B, L), np.float32)
    vmask[:, :4] = 1.0
    embs = np.eye(4, dtype=np.float32)[:4]
    got = float(lossfun_match(jnp.asarray(probs), jnp.asarray(embs), jnp.asarray(labels), jnp.asarray(vmask)))
    assert got == pytest.approx(1.0, abs=1e-5)


def test_lossfun_loc2d_matches_torch_bce():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(1)
    B, L = 4, 16
    scores = rng.standard_normal((B, L, L)).astype(np.float32)
    labels = rng.random((B, L, L)).astype(np.float32)
    mask = np.triu(np.ones((L, L), bool))
    got = float(lossfun_loc2d(jnp.asarray(scores), jnp.asarray(labels), jnp.asarray(mask)))

    t_scores = torch.tensor(scores)
    t_labels = torch.clamp((torch.tensor(labels) - 0.5) / 0.5, 0, 1)
    t_mask = torch.tensor(mask)[None].expand(B, L, L)
    want = float(
        torch.nn.functional.binary_cross_entropy_with_logits(
            t_scores.masked_select(t_mask), t_labels.masked_select(t_mask)
        )
    )
    assert got == pytest.approx(want, abs=1e-5)


def test_lossfun_softloc_zero_for_identical():
    rng = np.random.default_rng(2)
    B, L = 4, 16
    logits = rng.standard_normal((B, L)).astype(np.float32)
    vmask = np.ones((B, L), np.float32)
    per_sample = lossfun_softloc(
        jnp.asarray(logits), jnp.asarray(logits), jnp.asarray(logits), jnp.asarray(logits),
        jnp.asarray(vmask), temperature=0.5,
    )
    np.testing.assert_allclose(np.asarray(per_sample), np.zeros(B), atol=1e-5)
