"""ActionFormer batch assembly.

Behavioral port of the reference's ActionFormerDataset + PtTransformer
preprocessing (models/ActionFormer.py:21-135, meta_archs.py:388-425), as one
static-shape batcher:

- base pipeline (augmentation + sampling) runs first, like the reference's
  BaseDataset.__getitem__ call;
- with ``force_upsampling`` every clip is linearly resized (torch
  F.interpolate, align_corners=False semantics) to ``max_seq_len``, the
  feat_stride is recomputed per clip (case 2, ActionFormer.py:52-56), and gt
  segments convert to feature-grid coordinates;
- the batch carries fps/duration/feat_stride/num_frames vectors so decoding
  back to seconds happens on device.
"""

from __future__ import annotations

import random
from typing import Dict, List

import numpy as np

from vmrframe_tpu.data.batcher import Batcher


def linear_resize(x: np.ndarray, size: int) -> np.ndarray:
    """torch F.interpolate(mode='linear', align_corners=False) over axis 0."""
    T = x.shape[0]
    if T == size:
        return x.astype(np.float32)
    scale = T / size
    src = (np.arange(size) + 0.5) * scale - 0.5
    src = np.clip(src, 0.0, T - 1)
    lo = np.floor(src).astype(np.int64)
    hi = np.minimum(lo + 1, T - 1)
    w = (src - lo).astype(np.float32)[:, None]
    return (x[lo] * (1.0 - w) + x[hi] * w).astype(np.float32)


def remove_duplicate_annotations(events, tol: float = 1e-3):
    """Drop duplicate (segment, label) annotations (the reference's unused
    fuller ActionFormer dataset, utils/ActionFormerDataset.py:12-30)."""
    out = []
    for event in events:
        s, e, label = event["segment"][0], event["segment"][1], event.get("label_id", 0)
        if not any(abs(s - p["segment"][0]) <= tol and abs(e - p["segment"][1]) <= tol
                   and label == p.get("label_id", 0) for p in out):
            out.append(event)
    return out


def truncate_feats(feats: np.ndarray, segment, max_seq_len: int, trunc_thresh: float,
                   rng: random.Random, max_num_trials: int = 200):
    """Random-crop features to max_seq_len keeping the gt segment mostly
    inside (utils/ActionFormerDataset.py truncate_feats semantics): retry
    crops until the overlap ratio with the (grid-coord) segment is at least
    trunc_thresh.  Returns (cropped_feats, shifted_segment)."""
    T = feats.shape[0]
    if T <= max_seq_len:
        return feats, segment
    s, e = segment
    seg_len = max(e - s, 1e-4)
    for _ in range(max_num_trials):
        st = rng.randint(0, T - max_seq_len)
        en = st + max_seq_len
        inter = max(0.0, min(e, en) - max(s, st))
        if inter / seg_len >= trunc_thresh:
            return feats[st:en], (max(s - st, 0.0), min(e - st, float(max_seq_len)))
    st = int(np.clip(0.5 * (s + e) - max_seq_len / 2, 0, T - max_seq_len))
    return feats[st : st + max_seq_len], (max(s - st, 0.0), min(e - st, float(max_seq_len)))


class ActionFormerBatcher(Batcher):
    def __init__(self, dataset, feature_store, cfg, derived, loadertype, batch_size=None):
        super().__init__(dataset, feature_store, cfg, derived, loadertype, batch_size)
        dp = cfg.get("dataprocess")
        self.default_fps = float(dp.get("default_fps", 30)) if dp else 30.0
        self.feat_stride_cfg = float(dp.get("feat_stride", 16)) if dp else 16.0
        self.num_frames_cfg = float(dp.get("num_frames", 16)) if dp else 16.0
        self.force_upsampling = bool(dp.get("force_upsampling", True)) if dp else True
        self.downsample_rate = int(dp.get("downsample_rate", 1)) if dp else 1
        self.max_seq_len = cfg.actionformer.max_seq_len

    def make_batch(self, indices: List[int], rng: random.Random) -> Dict[str, np.ndarray]:
        B = self.batch_size
        T = self.max_seq_len
        C = self.cfg.actionformer.input_dim

        feats = np.zeros((B, T, C), dtype=np.float32)
        masks = np.zeros((B, T), dtype=np.float32)
        gt_segments = np.zeros((B, 2), dtype=np.float32)
        fps_v = np.full((B,), self.default_fps, dtype=np.float32)
        duration = np.ones((B,), dtype=np.float32)
        feat_stride = np.ones((B,), dtype=np.float32)
        feat_num_frames = np.ones((B,), dtype=np.float32)
        se_fracs = np.zeros((B, 2), dtype=np.float32)
        sample_mask = np.zeros((B,), dtype=np.float32)

        for slot, idx in enumerate(indices):
            record = self.dataset[idx]
            vfeat, _ = self._get_vfeat_label(record, rng)
            t0 = vfeat.shape[0]
            if self.force_upsampling:
                # case 2 (ActionFormer.py:52-56): recomputed stride + resize
                stride = ((t0 - 1) * self.feat_stride_cfg + self.num_frames_cfg) / T
                nframes = stride
                vfeat = linear_resize(vfeat, T)
                cur_len = T
            else:
                stride, nframes = self.feat_stride_cfg, self.num_frames_cfg
                if self.downsample_rate > 1:
                    vfeat = vfeat[:: self.downsample_rate]
                    stride *= self.downsample_rate
                cur_len = min(vfeat.shape[0], T)
                vfeat = vfeat[:cur_len]
            offset = 0.5 * nframes / stride
            s_time, e_time = record["se_time"]
            feats[slot, :cur_len] = vfeat
            masks[slot, :cur_len] = 1.0
            gt_segments[slot] = [
                s_time * self.default_fps / stride - offset,
                e_time * self.default_fps / stride - offset,
            ]
            duration[slot] = record["duration"]
            feat_stride[slot] = stride
            feat_num_frames[slot] = nframes
            se_fracs[slot] = record["se_frac"]
            sample_mask[slot] = 1.0

        return {
            "feats": feats,
            "masks": masks,
            "gt_segments": gt_segments,
            "fps": fps_v,
            "duration": duration,
            "feat_stride": feat_stride,
            "feat_num_frames": feat_num_frames,
            "se_fracs": se_fracs,
            "sample_mask": sample_mask,
            "num_valid": np.int32(len(indices)),
        }
