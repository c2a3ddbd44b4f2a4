"""C++ NMS kernel: build, run, and cross-check against the jax version."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from vmrframe_tpu.native import native_available, nms_1d_cpu
from vmrframe_tpu.ops.nms import nms_1d

pytestmark = pytest.mark.skipif(not native_available(), reason="g++ unavailable")


def _problem(n=64, seed=0):
    rng = np.random.default_rng(seed)
    starts = rng.random(n).astype(np.float32) * 50
    lengths = rng.random(n).astype(np.float32) * 20 + 1
    segs = np.stack([starts, starts + lengths], axis=1)
    scores = rng.random(n).astype(np.float32)
    return segs, scores


def test_hard_nms_matches_jax():
    segs, scores = _problem()
    c_segs, c_scores, _ = nms_1d_cpu(segs, scores, iou_threshold=0.5, min_score=0.01,
                                     method=0, max_keep=20)
    j_segs, j_scores, valid = nms_1d(jnp.asarray(segs), jnp.asarray(scores), 0.5, 20,
                                     0.01, 0, 0.5)
    j_segs = np.asarray(j_segs)[np.asarray(valid)]
    j_scores = np.asarray(j_scores)[np.asarray(valid)]
    assert c_segs.shape == j_segs.shape
    np.testing.assert_allclose(c_segs, j_segs, atol=1e-6)
    np.testing.assert_allclose(c_scores, j_scores, atol=1e-6)


def test_gaussian_soft_nms_matches_jax():
    segs, scores = _problem(seed=1)
    sigma = 0.75
    c_segs, c_scores, _ = nms_1d_cpu(segs, scores, iou_threshold=0.1, min_score=0.001,
                                     method=2, sigma=sigma, max_keep=30)
    j_segs, j_scores, valid = nms_1d(jnp.asarray(segs), jnp.asarray(scores), 0.1, 30,
                                     0.001, 2, sigma)
    j_segs = np.asarray(j_segs)[np.asarray(valid)]
    j_scores = np.asarray(j_scores)[np.asarray(valid)]
    assert c_segs.shape == j_segs.shape
    np.testing.assert_allclose(c_segs, j_segs, atol=1e-5)
    np.testing.assert_allclose(c_scores, j_scores, atol=1e-5)


def test_linear_soft_nms_decays():
    segs = np.array([[0, 10], [1, 11], [30, 40]], np.float32)
    scores = np.array([0.9, 0.8, 0.5], np.float32)
    kept, kscores, idx = nms_1d_cpu(segs, scores, iou_threshold=0.3, min_score=0.01,
                                    method=1, max_keep=3)
    assert list(idx) == [0, 2, 1]  # overlap decayed below the far segment
    assert kscores[2] < 0.8 * 0.4  # decayed by (1 - iou)


def test_min_score_stops_selection():
    segs = np.array([[0, 10], [0, 10]], np.float32)
    scores = np.array([0.9, 0.8], np.float32)
    kept, kscores, idx = nms_1d_cpu(segs, scores, iou_threshold=0.1, min_score=0.5,
                                    method=2, sigma=0.1, max_keep=5)
    # duplicate decays to ~0 < min_score -> only one kept
    assert len(idx) == 1


def test_linear_soft_nms_matches_jax():
    segs, scores = _problem(seed=2)
    c_segs, c_scores, _ = nms_1d_cpu(segs, scores, iou_threshold=0.3, min_score=0.001,
                                     method=1, max_keep=30)
    j_segs, j_scores, valid = nms_1d(jnp.asarray(segs), jnp.asarray(scores), 0.3, 30,
                                     0.001, 1, 0.5)
    j_segs = np.asarray(j_segs)[np.asarray(valid)]
    j_scores = np.asarray(j_scores)[np.asarray(valid)]
    assert c_segs.shape == j_segs.shape
    np.testing.assert_allclose(c_segs, j_segs, atol=1e-5)
    np.testing.assert_allclose(c_scores, j_scores, atol=1e-5)
