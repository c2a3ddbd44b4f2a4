import numpy as np
import pytest

from vmrframe_tpu.data.labels import (
    dist_idx_label,
    iou2d_label,
    label_span_from_curve,
    mask2d,
    ner_label,
    soft_label,
)


def test_dist_idx_clipping_and_peaks():
    lab = dist_idx_label(5, 12, 32)
    assert lab.shape == (2, 32)
    # exact peak at the boundary indices
    assert lab[0, 5] == 1.0
    assert lab[1, 12] == 1.0
    # clipped to {0} ∪ [0.1353, 1]
    assert np.all((lab == 0) | (lab >= 0.1353))
    assert np.all(lab <= 1.0)


def test_dist_idx_fallback_for_long_spans():
    # a span covering everything makes the Gaussian flat & sub-0.4: the
    # argmax fallback must still place a single 1
    lab = dist_idx_label(0, 255, 256)
    assert (lab[0] > 0.4).sum() >= 1
    assert (lab[1] > 0.4).sum() >= 1


def test_ner_label_obie():
    lab = ner_label(5, 12, 32, 32)
    # B covers sidx±1, E covers eidx±1, I between, O outside
    assert list(lab[:4]) == [0, 0, 0, 0]
    assert list(lab[4:7]) == [1, 1, 1]
    assert list(lab[7:11]) == [2, 2, 2, 2]
    assert list(lab[11:14]) == [3, 3, 3]
    assert list(lab[14:]) == [0] * 18


def test_ner_label_touching_boundaries():
    lab = ner_label(0, 1, 8, 8)
    # start and end regions overlap; E (written last) overwrites B
    assert list(lab[:3]) == [3, 3, 3]
    lab2 = ner_label(6, 7, 8, 16)
    # clamped to cur_len-1=7, nothing past the valid clip
    assert np.all(lab2[8:] == 0)


def test_ner_label_clamps_to_cur_len():
    lab = ner_label(3, 5, 6, 12)
    assert np.all(lab[6:] == 0)  # frames past cur_len stay O


def test_label_span_from_curve():
    curve = np.array([0.0, 0.005, 0.2, 1.0, 0.5, 0.0])
    assert label_span_from_curve(curve) == (2, 4)
    with pytest.raises(AssertionError):
        label_span_from_curve(np.zeros(4))


def test_soft_label_partition():
    s, e, m = soft_label(5, 12, 32, 32, alpha=0.3)
    assert m.shape == (32, 4)
    assert s[5] == pytest.approx(1.0)
    assert e[12] == pytest.approx(1.0)


def test_iou2d_label_diagonal():
    lab = iou2d_label(0.0, 10.0, 10.0, 16)
    # cell (0, 15) spans the whole video -> IoU 1
    assert lab[0, 15] == pytest.approx(1.0)
    assert lab.shape == (16, 16)


def test_mask2d_shape_and_diagonal():
    m = mask2d(64)
    assert m.shape == (64, 64)
    assert np.all(np.diag(m))
    # strictly-lower-triangular cells never valid
    assert not np.any(np.tril(m, k=-1))
