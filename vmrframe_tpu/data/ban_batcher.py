"""BAN batch assembly — behavioral port of collate_fn_BAN
(models/BAN.py:139-209) plus the contrast masks BaseDataset was supposed to
provide (get_map2d_contrast, utils/BaseDataset.py:97-115).

Per batch: word ids + actual lengths, padded features + lengths, the boundary
dist label (label1d), the (L, L) IoU map built WITHOUT the +1 end shift (a
reference inconsistency, see labels.iou2d_label), the (L, L, 2) start/end
offset map, and the (2, L, L) pos/neg contrast masks.
"""

from __future__ import annotations

import random
from typing import Dict, List

import numpy as np

from vmrframe_tpu.data.batcher import Batcher
from vmrframe_tpu.data.labels import (
    dist_idx_label,
    iou2d_label,
    label_span_from_curve,
    map2d_contrast,
    se_offset_label,
)


class BANBatcher(Batcher):
    def make_batch(self, indices: List[int], rng: random.Random) -> Dict[str, np.ndarray]:
        B = self.batch_size
        L, T = self.vlen, self.tlen

        vfeats = np.zeros((B, L, self.vdim), dtype=np.float32)
        vlens = np.ones((B,), dtype=np.int32)
        words_ids = np.zeros((B, T), dtype=np.int32)
        tlens = np.ones((B,), dtype=np.int32)
        dist_idxs = np.zeros((B, 2, L), dtype=np.float32)
        iou2ds = np.zeros((B, L, L), dtype=np.float32)
        start_end_offset = np.zeros((B, L, L, 2), dtype=np.float32)
        map2d_contrasts = np.zeros((B, 2, L, L), dtype=bool)
        se_times = np.zeros((B, 2), dtype=np.float32)
        se_fracs = np.zeros((B, 2), dtype=np.float32)
        sample_mask = np.zeros((B,), dtype=np.float32)

        for slot, idx in enumerate(indices):
            record = self.dataset[idx]
            vfeat, label = self._get_vfeat_label(record, rng)
            cur_len = vfeat.shape[0]
            sidx, eidx = label_span_from_curve(label)
            vfeats[slot, :cur_len] = vfeat
            vlens[slot] = cur_len
            wids = record["wids"][:T]
            words_ids[slot, : len(wids)] = wids
            tlens[slot] = max(len(wids), 1)
            dist_idxs[slot] = dist_idx_label(sidx, eidx, L)
            stime, etime = record["se_time"]
            duration = record["duration"]
            iou2ds[slot] = iou2d_label(stime, etime, duration, L, end_plus_one=False)
            start_end_offset[slot] = se_offset_label(stime, etime, duration, L)
            map2d_contrasts[slot] = map2d_contrast(sidx, eidx, L)
            se_times[slot] = record["se_time"]
            se_fracs[slot] = record["se_frac"]
            sample_mask[slot] = 1.0

        return {
            "words_ids": words_ids,
            "tlens": tlens,
            "vfeats": vfeats,
            "vlens": vlens,
            "dist_idxs": dist_idxs,
            "iou2ds": iou2ds,
            "start_end_offset": start_end_offset,
            "map2d_contrasts": map2d_contrasts,
            "se_times": se_times,
            "se_fracs": se_fracs,
            "sample_mask": sample_mask,
            "num_valid": np.int32(len(indices)),
        }
