import numpy as np
import pytest

from vmrframe_tpu.metrics import (
    calculate_iou,
    calculate_iou_accuracy,
    frac_idx,
    get_i345_mi,
    idx_time,
    time_idx,
)


def test_calculate_iou_basic():
    assert calculate_iou([0.0, 1.0], [0.0, 1.0]) == 1.0
    assert calculate_iou([0.0, 0.5], [0.5, 1.0]) == 0.0
    assert calculate_iou([0.0, 0.6], [0.4, 1.0]) == pytest.approx(0.2)
    # degenerate: zero union
    assert calculate_iou([0.3, 0.3], [0.3, 0.3]) == 0.0
    # disjoint: clamped at 0
    assert calculate_iou([0.0, 0.2], [0.8, 1.0]) == 0.0


def test_get_i345_mi_duplicates_r1i5():
    ious = [0.8, 0.6, 0.4, 0.2]
    r1i3, r1i5, r1i5b, r1i7, mi = get_i345_mi(ious)
    assert r1i5 == r1i5b  # the reference's quirky duplicate return
    assert r1i3 == 75.0
    assert r1i5 == 50.0
    assert r1i7 == 25.0
    assert mi == pytest.approx(50.0)


def test_iou_accuracy_threshold_inclusive():
    assert calculate_iou_accuracy([0.5, 0.49], 0.5) == 50.0


def test_index_conversions():
    assert frac_idx(0.5, 65) == 32
    assert frac_idx([0.0, 1.0], 100) == [0, 99]
    assert time_idx(5.0, 10.0, 11) == 5
    assert idx_time(5, 10.0, 11) == 5.0


def test_iou_device_matches_host():
    import jax.numpy as jnp

    from vmrframe_tpu.metrics import iou_device

    rng = np.random.default_rng(0)
    gt = np.sort(rng.random((32, 2)), axis=1).astype(np.float32)
    pred = np.sort(rng.random((32, 2)), axis=1).astype(np.float32)
    dev = np.asarray(iou_device(jnp.asarray(gt), jnp.asarray(pred)))
    host = np.array([calculate_iou(g, p) for g, p in zip(gt, pred)])
    np.testing.assert_allclose(dev, host, atol=1e-6)
