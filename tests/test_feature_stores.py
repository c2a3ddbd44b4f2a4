"""Feature stores: .npy directory vs single-HDF5-file layouts.

The reference's main pipeline globs ``feature_path/*.npy``
(utils/data_utils.py:13-40); its alternate ActionFormer dataset is written
for an h5py-backed dict-like (utils/ActionFormerDataset.py:3,169).  Both
layouts must produce identical arrays through the same store interface.
"""

import numpy as np
import pytest

from vmrframe_tpu.data.features import (
    H5FeatureStore,
    VideoFeatureStore,
    open_feature_store,
)

h5py = pytest.importorskip("h5py")


@pytest.fixture()
def feature_arrays():
    rng = np.random.default_rng(7)
    return {f"vid{i}": rng.standard_normal((int(rng.integers(8, 40)), 16))
            .astype(np.float32) for i in range(5)}


@pytest.fixture()
def h5_path(tmp_path, feature_arrays):
    path = str(tmp_path / "feats.h5")
    with h5py.File(path, "w") as f:
        for vid, arr in feature_arrays.items():
            f.create_dataset(vid, data=arr)
    return path


@pytest.mark.parametrize("lazy", [False, True])
def test_h5_store_matches_npy_store(tmp_path, feature_arrays, h5_path, lazy):
    npy_dir = tmp_path / "npy"
    npy_dir.mkdir()
    for vid, arr in feature_arrays.items():
        np.save(npy_dir / f"{vid}.npy", arr)

    npy = VideoFeatureStore(str(npy_dir), max_vlen=64, lazy=lazy)
    h5 = H5FeatureStore(h5_path, lazy=lazy)
    assert npy.lengths() == h5.lengths()
    for vid, arr in feature_arrays.items():
        assert vid in h5
        np.testing.assert_array_equal(npy[vid], h5[vid])
        assert h5[vid].dtype == np.float32
    assert "missing" not in h5


@pytest.mark.parametrize("lazy", [False, True])
def test_h5_store_transpose_channel_first(tmp_path, feature_arrays, lazy):
    """C-first stores (the alt ActionFormer layout before its own .T,
    utils/ActionFormerDataset.py:206) decode back to (T, D)."""
    path = str(tmp_path / "cfirst.h5")
    with h5py.File(path, "w") as f:
        for vid, arr in feature_arrays.items():
            f.create_dataset(vid, data=arr.T)
    store = H5FeatureStore(path, lazy=lazy, transpose=True)
    for vid, arr in feature_arrays.items():
        np.testing.assert_array_equal(store[vid], arr)
    assert store.lengths() == {v: a.shape[0] for v, a in feature_arrays.items()}


def test_open_feature_store_dispatch(tmp_path, feature_arrays, h5_path):
    npy_dir = tmp_path / "npy"
    npy_dir.mkdir()
    for vid, arr in feature_arrays.items():
        np.save(npy_dir / f"{vid}.npy", arr)
    assert isinstance(open_feature_store(str(npy_dir), 64), VideoFeatureStore)
    assert isinstance(open_feature_store(h5_path, 64), H5FeatureStore)
