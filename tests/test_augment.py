import random

import numpy as np
import pytest

from vmrframe_tpu.data.augment import (
    feature_dilation,
    feature_erosion,
    interpolate_average,
    sample_vfeat_linear,
    video_augmentation,
)


def naive_interpolate_average(x, size):
    """Oracle: the reference's per-segment loop (utils/data_utils.py:161-175),
    written independently in numpy."""
    vlen = x.shape[0]
    idxs = np.arange(0, size, 1.0) / size * (vlen - 1)
    idxs = np.concatenate([idxs, [float(vlen)]])
    idxs = np.round(idxs).astype(int)
    out = []
    for i in range(size):
        s, e = idxs[i], idxs[i + 1]
        if s < e:
            out.append(x[s:e].mean(axis=0))
        else:
            out.append(x[s])
    return np.stack(out)


@pytest.mark.parametrize("vlen,size", [(100, 64), (257, 64), (64, 64), (63, 64), (1000, 256)])
def test_interpolate_average_matches_naive(vlen, size):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((vlen, 8)).astype(np.float32)
    got = interpolate_average(x, size)
    want = naive_interpolate_average(x, size)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_interpolate_average_1d_label():
    lab = np.zeros(200, dtype=np.float32)
    lab[50:100] = 1.0
    out = interpolate_average(lab, 64)
    assert out.shape == (64,)
    assert out.max() == pytest.approx(1.0)
    assert out.min() == 0.0


def test_truncation_only_resamples_long_clips():
    x = np.ones((32, 4), np.float32)
    lab = np.ones(32, np.float32)
    vf, lb = sample_vfeat_linear(x, lab, 64, "truncation")
    assert vf.shape == (32, 4)  # untouched
    x2 = np.ones((128, 4), np.float32)
    lab2 = np.ones(128, np.float32)
    vf2, lb2 = sample_vfeat_linear(x2, lab2, 64, "truncation")
    assert vf2.shape == (64, 4)
    assert lb2.shape == (64,)


def test_dilation_grows_and_keeps_gt():
    rng = random.Random(0)
    x = np.arange(40, dtype=np.float32).reshape(40, 1).repeat(3, axis=1)
    lab = np.zeros(40, np.float32)
    lab[10:20] = 1.0
    vf, lb = feature_dilation(x, lab, 0.2, rng)
    assert vf.shape[0] == lb.shape[0] >= 40
    assert lb.sum() == lab.sum()  # gt frames preserved exactly


def test_erosion_shrinks_and_keeps_gt():
    rng = random.Random(0)
    x = np.arange(40, dtype=np.float32).reshape(40, 1)
    lab = np.zeros(40, np.float32)
    lab[10:20] = 1.0
    vf, lb = feature_erosion(x, lab, 0.2, rng)
    assert vf.shape[0] <= 40
    assert lb.sum() == lab.sum()  # gt frames never cropped


def test_video_augmentation_unchanged():
    rng = random.Random(0)
    x = np.random.default_rng(0).standard_normal((50, 4)).astype(np.float32)
    vf, lb = video_augmentation(0.2, 0.6, x, {"unchanged": None}, rng)
    np.testing.assert_array_equal(vf, x)
    # frac_idx boundaries: round(0.2*49)=10, round(0.6*49)=29
    assert lb[10] == 1.0 and lb[29] == 1.0 and lb[9] == 0.0 and lb[30] == 0.0
