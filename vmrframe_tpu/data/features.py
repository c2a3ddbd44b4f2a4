"""Video feature stores.

``VideoFeatureStore`` mirrors the reference's VideoFeatureDict
(utils/data_utils.py:13-40): glob ``feature_path/*.npy``; eager-load
everything to RAM, or lazy per-item load in debug mode.  Features stay
float32 numpy on host — they only cross to HBM as assembled static-shape
batches.

``SyntheticFeatureStore`` generates deterministic random features per vid so
tests/benchmarks run with no dataset on disk.

``H5FeatureStore`` reads per-video datasets out of one HDF5 file — the
feature layout the reference's alternate ActionFormer dataset is written
for (utils/ActionFormerDataset.py:3 imports h5py; its ``video_features``
dict-like is indexed per vid at :169).  Works with every batcher here, not
just the ActionFormer one.
"""

from __future__ import annotations

import glob
import os
from typing import Dict, Optional

import numpy as np


class VideoFeatureStore:
    def __init__(self, root: str, max_vlen: int, lazy: bool = False):
        self.lazy = lazy
        self.max_vlen = max_vlen
        self.path_dict: Dict[str, str] = {}
        self.features: Dict[str, np.ndarray] = {}
        for filename in glob.glob(os.path.join(root, "*.npy")):
            vid = os.path.basename(filename).split(".")[0]
            if lazy:
                self.path_dict[vid] = filename
            else:
                self.features[vid] = np.asarray(np.load(filename), dtype=np.float32)
                self.path_dict[vid] = filename

    def __contains__(self, vid: str) -> bool:
        return vid in self.path_dict

    def __getitem__(self, vid: str) -> np.ndarray:
        if self.lazy:
            return np.asarray(np.load(self.path_dict[vid]), dtype=np.float32)
        return self.features[vid]

    def lengths(self) -> Dict[str, int]:
        if self.lazy:
            out = {}
            for vid, path in self.path_dict.items():
                with open(path, "rb") as f:
                    version = np.lib.format.read_magic(f)
                    shape, _, _ = np.lib.format._read_array_header(f, version)
                out[vid] = shape[0]
            return out
        return {vid: feat.shape[0] for vid, feat in self.features.items()}


def open_feature_store(path: str, max_vlen: int, lazy: bool = False):
    """Dispatch on the feature path: an ``.h5``/``.hdf5`` FILE opens as an
    ``H5FeatureStore``; a directory globs ``*.npy`` (the reference's main
    layout, utils/data_utils.py:13-40)."""
    if os.path.isfile(path) and path.endswith((".h5", ".hdf5")):
        return H5FeatureStore(path, lazy=lazy)
    return VideoFeatureStore(path, max_vlen, lazy=lazy)


class H5FeatureStore:
    """Features in one HDF5 file: ``file[vid]`` is a (T, D) float dataset.

    ``transpose`` handles stores written channel-first (C, T) — the layout
    the reference's alt ActionFormer dataset expects before its own ``.T``
    (utils/ActionFormerDataset.py:169,206).  Eager mode decodes everything
    to RAM once; lazy mode keeps the file open and reads per item.
    """

    def __init__(self, path: str, lazy: bool = False, transpose: bool = False):
        import h5py

        self.path = path
        self.lazy = lazy
        self.transpose = transpose
        self._file = h5py.File(path, "r")
        self._keys = set(self._file.keys())
        self.features: Dict[str, np.ndarray] = {}
        if not lazy:
            for vid in self._keys:
                self.features[vid] = self._decode(self._file[vid])
            self._file.close()
            self._file = None

    def _decode(self, dset) -> np.ndarray:
        arr = np.asarray(dset, dtype=np.float32)
        return arr.T if self.transpose else arr

    def __contains__(self, vid: str) -> bool:
        return str(vid) in self._keys

    def __getitem__(self, vid: str) -> np.ndarray:
        vid = str(vid)
        if self.lazy:
            return self._decode(self._file[vid])
        return self.features[vid]

    def lengths(self) -> Dict[str, int]:
        if self.lazy:
            ax = 1 if self.transpose else 0
            return {vid: int(self._file[vid].shape[ax]) for vid in self._keys}
        return {vid: feat.shape[0] for vid, feat in self.features.items()}


class SyntheticFeatureStore:
    """Deterministic random features keyed by vid (for tests / benches)."""

    def __init__(self, vids, vdim: int, min_len: int = 16, max_len: int = 256, seed: int = 0):
        self.vdim = vdim
        self._lens: Dict[str, int] = {}
        rng = np.random.default_rng(seed)
        for vid in vids:
            self._lens[str(vid)] = int(rng.integers(min_len, max_len + 1))
        self._seed = seed

    def __contains__(self, vid: str) -> bool:
        return str(vid) in self._lens

    def __getitem__(self, vid: str) -> np.ndarray:
        vid = str(vid)
        length = self._lens[vid]
        # stable across processes (python's hash() is randomized per run)
        import zlib

        key = zlib.crc32(f"{vid}/{self._seed}".encode())
        rng = np.random.default_rng(key)
        return rng.standard_normal((length, self.vdim)).astype(np.float32)

    def lengths(self) -> Dict[str, int]:
        return dict(self._lens)
