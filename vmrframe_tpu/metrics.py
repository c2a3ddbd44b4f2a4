"""Evaluation metrics: Recall@1 at IoU thresholds + mean IoU.

Host-side aggregation mirrors the reference (models/loss.py:83-109,
utils/utils.py:161-185): per-sample temporal IoU between ground-truth
fractional spans and predicted fractional spans, then R1@{0.3,0.5,0.7} and
mIoU (as percentages).  ``get_i345_mi`` reproduces the reference's 5-tuple
return (r1i3, r1i5, r1i5, r1i7, mi — r1i5 duplicated, models/loss.py:103-109)
so downstream unpack sites stay drop-in compatible.

The device-side vectorized IoU (``iou_device``) lets the jitted eval step
produce per-sample IoUs with a single small D2H copy per batch.
"""

from __future__ import annotations

from typing import Iterable, List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np


def calculate_iou(i0: Sequence[float], i1: Sequence[float]) -> float:
    """Scalar temporal IoU (reference utils/utils.py:161-168)."""
    union = (min(i0[0], i1[0]), max(i0[1], i1[1]))
    inter = (max(i0[0], i1[0]), min(i0[1], i1[1]))
    if (union[1] - union[0]) == 0.0:
        return 0.0
    iou = 1.0 * (inter[1] - inter[0]) / (union[1] - union[0])
    return max(0.0, iou)


def iou_device(gt_se: jnp.ndarray, pred_se: jnp.ndarray) -> jnp.ndarray:
    """Vectorized IoU of (B, 2) fractional spans, on device.

    Matches calculate_iou semantics including the union==0 -> 0 guard.
    """
    inter = jnp.minimum(gt_se[:, 1], pred_se[:, 1]) - jnp.maximum(gt_se[:, 0], pred_se[:, 0])
    union = jnp.maximum(gt_se[:, 1], pred_se[:, 1]) - jnp.minimum(gt_se[:, 0], pred_se[:, 0])
    iou = jnp.where(union == 0.0, 0.0, inter / jnp.where(union == 0.0, 1.0, union))
    return jnp.maximum(iou, 0.0)


def append_ious(ious: List[float], se_gts, se_props) -> List[float]:
    """Accumulate per-sample IoUs (reference models/loss.py:83-90)."""
    for gt_se, prop_se in zip(np.asarray(se_gts), np.asarray(se_props)):
        ious.append(calculate_iou(gt_se, prop_se))
    return ious


def calculate_iou_accuracy(ious: Iterable[float], threshold: float) -> float:
    ious = list(ious)
    if not ious:
        return 0.0
    count = sum(1 for iou in ious if iou >= threshold)
    return float(count) / float(len(ious)) * 100.0


def get_i345_mi(ious: Sequence[float]) -> Tuple[float, float, float, float, float]:
    """R1@{0.3,0.5,0.7} + mIoU, duplicating r1i5 exactly like the reference
    (models/loss.py:103-109) so 5-variable unpacks keep working."""
    r1i3 = calculate_iou_accuracy(ious, threshold=0.3)
    r1i5 = calculate_iou_accuracy(ious, threshold=0.5)
    r1i7 = calculate_iou_accuracy(ious, threshold=0.7)
    mi = float(np.mean(ious) * 100.0) if len(ious) else 0.0
    return r1i3, r1i5, r1i5, r1i7, mi


class AverageMeter:
    """Running average (reference utils/utils.py:11-26)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val: float, n: int = 1):
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / self.count


# ---- fraction <-> index conversions (reference utils/utils.py:50-75) ----

def time_idx(t, duration, vlen):
    if isinstance(t, (list, tuple)):
        return [time_idx(i, duration, vlen) for i in t]
    return round(t / duration * (vlen - 1))


def frac_idx(frac, vlen):
    if isinstance(frac, (list, tuple)):
        return [frac_idx(i, vlen) for i in frac]
    return round(frac * (vlen - 1))


def idx_time(t, duration, vlen):
    if isinstance(t, (list, tuple)):
        return [idx_time(i, duration, vlen) for i in t]
    return round(t / (vlen - 1) * duration, 2)
