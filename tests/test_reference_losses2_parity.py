"""Parity vs the ACTUAL reference loss.py for the losses round 2 left on
hand oracles: lossfun_loc2d (reference models/loss.py:169-178),
lossfun_softloc (:180-198), CPL's cal_nll_loss / rec_loss_cpl /
div_loss_cpl (:115-166), plus MultiTeacher's calculate_adapt_cof +
utils.iou_batch (MultiTeacher.py:151-159, utils/utils.py:169-177).
lossfun_loc / lossfun_match were already pinned in
test_reference_modules_parity.py.
"""

from __future__ import annotations

from types import SimpleNamespace

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

try:
    from tests._reference import load as load_ref
    from tests._reference import load_cpl
except ImportError:
    from _reference import load as load_ref
    from _reference import load_cpl

ATOL = 1e-4


@pytest.fixture(scope="module")
def ref_loss():
    load_cpl()  # installs the CPU-safe .cuda() identity div_loss_cpl needs
    return load_ref("models.loss")


@pytest.fixture()
def rng():
    torch.manual_seed(13)
    return np.random.default_rng(13)


def np_(t):
    return t.detach().numpy()


def rand_mask(rng, B, L, min_len=2):
    lens = rng.integers(min_len, L + 1, size=B)
    lens[0] = L
    return (np.arange(L)[None, :] < lens[:, None]).astype(np.float32)


def test_lossfun_loc2d_vs_reference(ref_loss, rng):
    from vmrframe_tpu.data.labels import mask2d as dense_mask2d
    from vmrframe_tpu.losses import lossfun_loc2d

    B, N = 3, 16
    scores2d = rng.standard_normal((B, N, N)).astype(np.float32)
    labels2d = rng.random((B, N, N)).astype(np.float32)
    mask = dense_mask2d(N)
    want = float(ref_loss.lossfun_loc2d(
        torch.from_numpy(scores2d), torch.from_numpy(labels2d),
        torch.from_numpy(mask.astype(bool))))
    got = float(lossfun_loc2d(jnp.asarray(scores2d), jnp.asarray(labels2d),
                              jnp.asarray(mask), 0.5, 1.0))
    np.testing.assert_allclose(got, want, atol=ATOL)


def test_lossfun_softloc_vs_reference(ref_loss, rng):
    from vmrframe_tpu.losses import lossfun_softloc

    B, L = 4, 12
    vmask = rand_mask(rng, B, L)
    mk = lambda: rng.standard_normal((B, L)).astype(np.float32)
    slog, elog, slab, elab = mk(), mk(), mk(), mk()
    temperature = 0.5
    want = np_(ref_loss.lossfun_softloc(
        torch.from_numpy(slog), torch.from_numpy(elog),
        torch.from_numpy(slab), torch.from_numpy(elab),
        torch.from_numpy(vmask), temperature))
    got = np.asarray(lossfun_softloc(
        jnp.asarray(slog), jnp.asarray(elog), jnp.asarray(slab),
        jnp.asarray(elab), jnp.asarray(vmask), temperature))
    np.testing.assert_allclose(got, want, atol=ATOL)


def test_cal_nll_loss_vs_reference(ref_loss, rng):
    from vmrframe_tpu.losses import cal_nll_loss

    N, L, V = 6, 9, 25
    logit = rng.standard_normal((N, L, V)).astype(np.float32)
    idx = rng.integers(0, V, (N, L))
    mask = rand_mask(rng, N, L)
    want_nll, want_acc = ref_loss.cal_nll_loss(
        torch.from_numpy(logit), torch.from_numpy(idx),
        torch.from_numpy(mask))
    got_nll, got_acc = cal_nll_loss(jnp.asarray(logit), jnp.asarray(idx),
                                    jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(got_nll), np_(want_nll), atol=ATOL)
    np.testing.assert_allclose(float(got_acc), float(want_acc), atol=ATOL)

    # weighted branch (loss.py:127-128)
    weights = rng.random((N, L)).astype(np.float32)
    want_nll, _ = ref_loss.cal_nll_loss(
        torch.from_numpy(logit), torch.from_numpy(idx),
        torch.from_numpy(mask), weights=torch.from_numpy(weights))
    got_nll, _ = cal_nll_loss(jnp.asarray(logit), jnp.asarray(idx),
                              jnp.asarray(mask), weights=jnp.asarray(weights))
    np.testing.assert_allclose(np.asarray(got_nll), np_(want_nll), atol=ATOL)


def test_rec_and_div_loss_cpl_vs_reference(ref_loss, rng):
    from vmrframe_tpu.losses import div_loss_cpl, rec_loss_cpl

    B, P, L, V, T = 3, 4, 10, 20, 6
    cfgs = SimpleNamespace(others=SimpleNamespace(
        cpl_num_props=P, cpl_div_lambda=0.15, cpl_div_loss_alhpa=2.0))

    tlogit = rng.standard_normal((B * P, T, V)).astype(np.float32)
    words_id = rng.integers(0, V, (B, T))
    words_mask = rand_mask(rng, B, T)
    want = float(ref_loss.rec_loss_cpl(
        cfgs, torch.from_numpy(tlogit), torch.from_numpy(words_id),
        torch.from_numpy(words_mask)))
    got = float(rec_loss_cpl(jnp.asarray(tlogit), jnp.asarray(words_id),
                             jnp.asarray(words_mask), P))
    np.testing.assert_allclose(got, want, atol=ATOL)

    gauss = rng.random((B * P, L)).astype(np.float32) + 0.05
    want = float(ref_loss.div_loss_cpl(torch.from_numpy(tlogit),
                                       torch.from_numpy(gauss), cfgs))
    got = float(div_loss_cpl(jnp.asarray(gauss), P, 0.15, 2.0))
    np.testing.assert_allclose(got, want, atol=ATOL)


def test_calculate_adapt_cof_vs_reference(rng):
    """MultiTeacher's teacher-confidence coefficient: argmax-span IoU between
    teacher and gt 1D labels.  The reference module imports the full model
    zoo; the function itself only needs utils.iou_batch, so we execute it
    against the REAL iou_batch with the reference's exact expression."""
    import torch

    ref_utils = load_ref("utils.utils")
    from vmrframe_tpu.models.distill import calculate_adapt_cof

    B, L = 8, 16
    t_label = rng.random((B, 2, L)).astype(np.float32)
    gt_label = rng.random((B, 2, L)).astype(np.float32)

    # the reference's calculate_adapt_cof body (MultiTeacher.py:151-159)
    T, G = torch.from_numpy(t_label), torch.from_numpy(gt_label)
    ts, te = torch.argmax(T[:, 0, :], dim=1), torch.argmax(T[:, 1, :], dim=1)
    gts, gte = torch.argmax(G[:, 0, :], dim=1), torch.argmax(G[:, 1, :], dim=1)
    want = np_(ref_utils.iou_batch(torch.stack([ts, te]), torch.stack([gts, gte])))

    got = np.asarray(calculate_adapt_cof(jnp.asarray(t_label), jnp.asarray(gt_label)))
    np.testing.assert_allclose(got, want, atol=ATOL)
