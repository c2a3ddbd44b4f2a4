"""1D NMS / Soft-NMS + segment voting — fixed-shape, on-device.

The reference calls a compiled CPU extension ``nms_1d_cpu`` per video
(models/ActionFormerlib/actionformer_utils.py:24-54) whose C++ source is
absent from the repo; semantics follow the standard ActionFormer upstream
(mmcv soft_nms): greedy max-score selection with

- method 0: hard IoU suppression,
- method 1: linear decay  s *= (1 - iou)  where iou > threshold,
- method 2: gaussian decay s *= exp(-iou^2 / sigma)  (always applied),

stopping at a min_score floor.  ``seg_voting`` is the box-voting refinement
(actionformer_utils.py:67-101) applied on the class-agnostic path when
``test_cfg.voting_thresh > 0`` — which the shipped ActionFormer configs set
(e.g. config/charades/ActionFormer.yaml: multiclass_nms false, voting 0.9).

Everything here runs as jit-friendly fixed-iteration loops over static-size
score vectors, so the whole eval batch stays on device (the reference
crosses GPU→CPU per video, meta_archs.py:708-750).  ``vmrframe_tpu/native``
carries a C++ CPU twin used for cross-checking semantics (all 3 methods).
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
    method: int = 2,
    sigma: float = 0.5,
):
    """Greedy (soft-)NMS over (N, 2) segments; ``method`` as in the module
    docstring (0 hard / 1 linear / 2 gaussian, matching the C++ twin and the
    reference's mmcv-style extension).

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
        if method == 0:  # hard
            suppress = ious > iou_threshold
            new_scores = cur_scores
            alive = jnp.where(suppress, False, alive)
        elif method == 1:  # linear soft
            decay = jnp.where(ious > iou_threshold, 1.0 - ious, 1.0)
            new_scores = jnp.where(alive, cur_scores * decay, cur_scores)
        else:  # gaussian soft
            decay = jnp.exp(-jnp.square(ious) / sigma)
            new_scores = jnp.where(alive, cur_scores * decay, cur_scores)
        alive = alive.at[idx].set(False)
        return (new_scores, alive), (best_seg, best_score, valid)

    init = (scores, jnp.ones((N,), dtype=bool))
    _, (kept_segs, kept_scores, valids) = jax.lax.scan(body, init, None, length=max_keep)
    return kept_segs, kept_scores, valids


batched_nms_1d = jax.vmap(nms_1d, in_axes=(0, 0, None, None, None, None, None))


def seg_voting(
    nms_segs: jnp.ndarray,
    all_segs: jnp.ndarray,
    all_scores: jnp.ndarray,
    iou_threshold: float,
    score_offset: float = 1.5,
) -> jnp.ndarray:
    """Box voting (reference actionformer_utils.py:67-101): each kept segment
    is replaced by the score-and-IoU weighted mean of its >=threshold
    neighbors among ALL candidate segments.

    NB the reference computes ``offset_scores = all_scores + score_offset``
    and then never uses it — the weights use the RAW scores
    (actionformer_utils.py:79,101).  Quirk preserved; ``score_offset`` is
    accepted for signature parity only.

    nms_segs: (K, 2); all_segs: (N, 2); all_scores: (N,).  Rows with no
    neighbor (e.g. the fixed-shape invalid tail) are returned unchanged.
    """
    del score_offset  # dead in the reference too
    left = jnp.maximum(nms_segs[:, None, 0], all_segs[None, :, 0])
    right = jnp.minimum(nms_segs[:, None, 1], all_segs[None, :, 1])
    inter = jnp.clip(right - left, 0.0)
    lens = (nms_segs[:, 1] - nms_segs[:, 0])[:, None] + (all_segs[:, 1] - all_segs[:, 0])[None, :]
    iou = inter / jnp.maximum(lens - inter, 1e-12)
    weights = (iou >= iou_threshold).astype(all_scores.dtype) * all_scores[None, :] * iou
    denom = jnp.sum(weights, axis=1, keepdims=True)
    refined = (weights @ all_segs) / jnp.maximum(denom, 1e-12)
    return jnp.where(denom > 0, refined, nms_segs)


batched_seg_voting = jax.vmap(seg_voting, in_axes=(0, 0, 0, None))
