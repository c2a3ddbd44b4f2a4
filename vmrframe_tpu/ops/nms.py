"""1D NMS / Soft-NMS — fixed-shape, on-device.

The reference calls a compiled CPU extension ``nms_1d_cpu`` per video
(models/ActionFormerlib/actionformer_utils.py:24-54) whose C++ source is
absent from the repo; semantics follow the standard ActionFormer upstream:
greedy max-score selection with hard IoU suppression, or Soft-NMS with
Gaussian score decay exp(-iou²/sigma) and a min_score floor.

Here both run as jit-friendly fixed-iteration loops over static-size score
vectors, so the whole eval batch stays on device (the reference crosses
GPU→CPU per video, meta_archs.py:708-750).  ``vmrframe_tpu/native`` carries a
C++ CPU twin used for cross-checking semantics.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _iou_1d(seg: jnp.ndarray, segs: jnp.ndarray) -> jnp.ndarray:
    """IoU of one (2,) segment vs (N, 2) segments."""
    inter = jnp.minimum(seg[1], segs[:, 1]) - jnp.maximum(seg[0], segs[:, 0])
    union = (seg[1] - seg[0]) + (segs[:, 1] - segs[:, 0]) - jnp.clip(inter, 0.0)
    return jnp.clip(inter, 0.0) / jnp.maximum(union, 1e-8)


def nms_1d(
    segs: jnp.ndarray,
    scores: jnp.ndarray,
    iou_threshold: float,
    max_keep: int,
    min_score: float = 0.001,
    soft: bool = True,
    sigma: float = 0.5,
):
    """Greedy (soft-)NMS over (N, 2) segments.

    Returns (kept_segs (max_keep, 2), kept_scores (max_keep,), valid mask
    (max_keep,)) sorted by decayed score.  Fixed iteration count = max_keep.
    """
    N = segs.shape[0]

    def body(carry, _):
        cur_scores, alive = carry
        cand = jnp.where(alive, cur_scores, -jnp.inf)
        idx = jnp.argmax(cand)
        best_score = cand[idx]
        best_seg = segs[idx]
        valid = best_score >= min_score
        ious = _iou_1d(best_seg, segs)
        if soft:
            decay = jnp.exp(-jnp.square(ious) / sigma)
            new_scores = jnp.where(alive, cur_scores * decay, cur_scores)
        else:
            suppress = ious > iou_threshold
            new_scores = cur_scores
            alive = jnp.where(suppress, False, alive)
        alive = alive.at[idx].set(False)
        return (new_scores, alive), (best_seg, best_score, valid)

    init = (scores, jnp.ones((N,), dtype=bool))
    _, (kept_segs, kept_scores, valids) = jax.lax.scan(body, init, None, length=max_keep)
    return kept_segs, kept_scores, valids


batched_nms_1d = jax.vmap(nms_1d, in_axes=(0, 0, None, None, None, None, None))
