"""Batchers for the distillation models.

``MultiTeacherBatcher`` loads up to three teacher-logit pickles
(cfg.loss.t{0,1,2}_path; format: index-aligned list of [vid, (2, T_t) array]
as written by tools/export_labels.py and the reference's
scripts/generate_*_label.py), resamples each curve to the sample's clip
length with align_corners=True linear interpolation and zero-pads to vlen —
the exact semantics of BaseDataset.load_label1d_teach
(utils/BaseDataset.py:150-155).  Teacher curves are train-only (the
reference's MultiTeacherDataset gates on loadertype).

When a pickle is absent (tests / synthetic runs) a deterministic synthetic
teacher is built from the gt span: unit-normalized Gaussian curves with
index-seeded jitter.

``CCAPreTrainBatcher`` ships one teacher's curves TIME-MAJOR as
``label1ds_t0`` (B, L, 2), matching collate_fn_BaseFast_CCA_PreTrain's
pad_video_seq handling + the [:, :, 0/1] indexing in its train engine.
"""

from __future__ import annotations

import os
import pickle
import random
from typing import Dict, List, Optional

import numpy as np

from vmrframe_tpu.data.batcher import Batcher
from vmrframe_tpu.data.labels import gaussian_weight, label_span_from_curve
from vmrframe_tpu.metrics import frac_idx


def linear_resample_ac(x: np.ndarray, size: int) -> np.ndarray:
    """torch F.interpolate(mode='linear', align_corners=True) over axis -1."""
    T = x.shape[-1]
    if T == size:
        return x.astype(np.float32)
    if size == 1:
        return x[..., :1].astype(np.float32)
    src = np.arange(size) * (T - 1) / (size - 1)
    lo = np.floor(src).astype(np.int64)
    hi = np.minimum(lo + 1, T - 1)
    w = (src - lo).astype(np.float32)
    return (x[..., lo] * (1.0 - w) + x[..., hi] * w).astype(np.float32)


def _load_teacher_pickle(path: Optional[str]):
    if path and os.path.exists(str(path)):
        with open(path, "rb") as f:
            data = pickle.load(f)
        return [(vid, np.asarray(logit, dtype=np.float32)) for vid, logit in data]
    return None


def _synthetic_teacher_curve(record: dict, index: int, vlen: int) -> np.ndarray:
    """Deterministic plausible teacher curves from the gt span."""
    rng = np.random.default_rng(1000 + index)
    sfrac, efrac = record["se_frac"]
    sidx, eidx = frac_idx([sfrac, efrac], vlen)
    s = gaussian_weight(sidx, vlen, vlen, alpha=0.2) + rng.random(vlen) * 0.05
    e = gaussian_weight(eidx, vlen, vlen, alpha=0.2) + rng.random(vlen) * 0.05
    return np.stack([s, e]).astype(np.float32)


class _TeacherCurves:
    def __init__(self, path: Optional[str], fallback_len: int = 48):
        self.data = _load_teacher_pickle(path)
        self.fallback_len = fallback_len

    def get(self, index: int, record: dict, cur_len: int, max_vlen: int) -> np.ndarray:
        if self.data is not None:
            vid, logit = self.data[index]
            assert str(vid) == str(record["vid"]), f"teacher pickle misaligned: {vid} vs {record['vid']}"
        else:
            logit = _synthetic_teacher_curve(record, index, self.fallback_len)
        curve = linear_resample_ac(logit, cur_len)  # (2, cur_len)
        out = np.zeros((2, max_vlen), dtype=np.float32)
        out[:, :cur_len] = curve
        return out


class MultiTeacherBatcher(Batcher):
    def __init__(self, dataset, feature_store, cfg, derived, loadertype, batch_size=None):
        super().__init__(dataset, feature_store, cfg, derived, loadertype, batch_size)
        self.teachers = []
        if loadertype == "train":
            for t in ("t0", "t1", "t2"):
                path = cfg.loss.get(f"{t}_path") if "loss" in cfg else None
                self.teachers.append(_TeacherCurves(path, fallback_len=self.vlen))

    def make_batch(self, indices: List[int], rng: random.Random) -> Dict[str, np.ndarray]:
        batch = super().make_batch(indices, rng)
        if not self.teachers:
            return batch
        B, L = self.batch_size, self.vlen
        for t_i, teacher in enumerate(self.teachers):
            curves = np.zeros((B, 2, L), dtype=np.float32)
            for slot, idx in enumerate(indices):
                record = self.dataset[idx]
                cur_len = int(batch["vmasks"][slot].sum())
                curves[slot] = teacher.get(idx, record, cur_len, L)
            batch[f"label1d_t{t_i}s"] = curves
        return batch


class CCAPreTrainBatcher(Batcher):
    def __init__(self, dataset, feature_store, cfg, derived, loadertype, batch_size=None):
        super().__init__(dataset, feature_store, cfg, derived, loadertype, batch_size)
        path = cfg.paths.get("result_model1_path") or (
            cfg.loss.get("t0_path") if "loss" in cfg else None)
        self.teacher = _TeacherCurves(path, fallback_len=self.vlen)

    def make_batch(self, indices: List[int], rng: random.Random) -> Dict[str, np.ndarray]:
        batch = super().make_batch(indices, rng)
        B, L = self.batch_size, self.vlen
        curves = np.zeros((B, L, 2), dtype=np.float32)
        for slot, idx in enumerate(indices):
            record = self.dataset[idx]
            cur_len = int(batch["vmasks"][slot].sum())
            curves[slot] = self.teacher.get(idx, record, cur_len, L).T  # time-major
        batch["label1ds_t0"] = curves
        return batch
