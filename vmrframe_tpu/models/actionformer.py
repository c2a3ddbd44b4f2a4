"""ActionFormer — single-stage anchor-free localizer wrapped for VMR
(reference models/ActionFormer.py + models/ActionFormerlib/meta_archs.py).

TPU-native redesign notes:

- label assignment (meta_archs.py:446-530) is vectorized over the whole
  batch on device (VMR has exactly one gt segment per sample, 1 class);
- inference is BATCHED and fully on device — the reference asserts
  batch_size==1 at eval and runs NMS on CPU per video
  (meta_archs.py:404,708-750); we run fixed-shape soft-NMS over all
  pyramid points for the whole batch (ops/nms.py);
- the EMA loss normalizer (meta_archs.py:324-326,585-588) is carried in
  TrainState.extras through the jitted step (registry ``stateful``);
- the reference's train engine backprops ONLY reg_loss
  (models/ActionFormer.py:154-161) and the model is commented out of
  __all__ (models/__init__.py) — its engine path is broken (indexes a list
  as a dict).  We train the full upstream objective
  final = cls_focal + weight·reg_diou, and integrate with the standard
  fraction-based metric engine, making this a first-class model here.
"""

from __future__ import annotations

import math
from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from vmrframe_tpu.layers.actionformer import (
    ConvHead,
    ConvTransformerBackbone,
    FPNIdentity,
    Scale,
    generate_points,
)
from vmrframe_tpu.ops.nms import batched_nms_1d, batched_seg_voting
from vmrframe_tpu.registry import register_model


def _af_cfg(cfg):
    return cfg.actionformer


class ActionFormer(nn.Module):
    cfg: Any
    derived: Any
    word_vectors: Any  # unused (no text branch), kept for a uniform factory

    @nn.compact
    def __call__(self, batch: Dict[str, jnp.ndarray], deterministic: bool = True):
        af = _af_cfg(self.cfg)
        arch = tuple(af.backbone_arch)
        num_levels = arch[2] + 1
        win = af.n_mha_win_size
        win_list = [win] * num_levels if isinstance(win, int) else list(win)
        train_cfg = af.train_cfg

        feats, masks = batch["feats"], batch["masks"]
        if af.backbone_type == "conv":
            from vmrframe_tpu.layers.actionformer import ConvBackbone

            fpn_feats, fpn_masks = ConvBackbone(
                n_in=af.input_dim, n_embd=af.embd_dim, n_embd_ks=af.embd_kernel_size,
                arch=arch, scale_factor=af.scale_factor, with_ln=af.embd_with_ln,
                name="backbone",
            )(feats, masks, deterministic)
        else:
            fpn_feats, fpn_masks = ConvTransformerBackbone(
                n_in=af.input_dim,
                n_embd=af.embd_dim,
                n_head=af.n_head,
                n_embd_ks=af.embd_kernel_size,
                max_len=af.max_seq_len,
                arch=arch,
                mha_win_size=win_list,
                scale_factor=af.scale_factor,
                with_ln=af.embd_with_ln,
                attn_pdrop=0.0,
                proj_pdrop=train_cfg.dropout,
                path_pdrop=train_cfg.droppath,
                use_abs_pe=af.use_abs_pe,
                use_rel_pe=bool(af.get("use_rel_pe", False)),
                pallas_min_len=int(af.get("pallas_min_len", 512)),
                # measured mode split (docs/BENCH_AF_LONG.json): Pallas wins
                # the train step, XLA wins the eval step at the shipped long
                # config — eval defaults to the XLA band-mask path
                pallas_min_len_eval=int(af.get("pallas_min_len_eval", -1)),
                name="backbone",
            )(feats, masks, deterministic)
        if af.fpn_type == "fpn":
            from vmrframe_tpu.layers.actionformer import FPN1D

            fpn_feats, fpn_masks = FPN1D(num_levels, af.fpn_dim, af.scale_factor,
                                         with_ln=af.fpn_with_ln, name="neck")(fpn_feats, fpn_masks)
        else:
            fpn_feats, fpn_masks = FPNIdentity(num_levels, with_ln=af.fpn_with_ln, name="neck")(
                fpn_feats, fpn_masks
            )

        prior_bias = -math.log((1 - train_cfg.cls_prior_prob) / train_cfg.cls_prior_prob)
        cls_logits = ConvHead(
            af.head_dim, af.num_classes, num_layers=af.head_num_layers,
            kernel_size=af.head_kernel_size, with_ln=af.head_with_ln,
            final_bias_init=prior_bias, name="cls_head",
        )(fpn_feats, fpn_masks, deterministic)
        reg_raw = ConvHead(
            af.head_dim, 2, num_layers=af.head_num_layers,
            kernel_size=af.head_kernel_size, with_ln=af.head_with_ln, name="reg_head",
        )(fpn_feats, fpn_masks, deterministic)
        offsets = [
            jax.nn.relu(Scale(name=f"scale_{l}")(o)) for l, o in enumerate(reg_raw)
        ]

        return {
            "cls_logits": jnp.concatenate(cls_logits, axis=1),  # (B, P, C)
            "offsets": jnp.concatenate(offsets, axis=1),  # (B, P, 2)
            "fpn_mask": jnp.concatenate(fpn_masks, axis=1),  # (B, P)
        }


def _points(cfg) -> np.ndarray:
    """(P, 4) concat of per-level (t, reg_min, reg_max, stride) buffers."""
    af = _af_cfg(cfg)
    strides = [af.scale_factor**i for i in range(af.fpn_start_level, af.backbone_arch[2] + 1)]
    pts = generate_points(af.max_seq_len, strides, af.regression_range)
    pts = [p[: af.max_seq_len // s] for p, s in zip(pts, strides)]
    return np.concatenate(pts, axis=0)


def label_points(points: jnp.ndarray, gt_segments: jnp.ndarray, cfg):
    """Vectorized single-gt label assignment (meta_archs.py:446-530).

    points: (P, 4); gt_segments: (B, 2) in grid coords.
    Returns cls_targets (B, P), reg_targets (B, P, 2) stride-normalized.
    """
    af = _af_cfg(cfg)
    t = points[None, :, 0]  # (1, P)
    stride = points[None, :, 3]
    gt_s = gt_segments[:, 0:1]  # (B, 1)
    gt_e = gt_segments[:, 1:2]
    left = t - gt_s  # (B, P)
    right = gt_e - t
    if af.train_cfg.center_sample == "radius":
        center = 0.5 * (gt_s + gt_e)
        radius = af.train_cfg.center_sample_radius
        t_min = jnp.maximum(center - stride * radius, gt_s)
        t_max = jnp.minimum(center + stride * radius, gt_e)
        inside = jnp.minimum(t - t_min, t_max - t) > 0
    else:
        inside = jnp.minimum(left, right) > 0
    max_reg = jnp.maximum(left, right)
    in_range = (max_reg >= points[None, :, 1]) & (max_reg <= points[None, :, 2])
    cls_targets = (inside & in_range).astype(jnp.float32)  # (B, P)
    reg_targets = jnp.stack([left, right], axis=-1) / stride[..., None]
    return cls_targets, reg_targets


def sigmoid_focal_loss(logits, targets, alpha: float = 0.25, gamma: float = 2.0):
    """Elementwise focal loss (reference ActionFormerlib/losses.py:4-52)."""
    p = jax.nn.sigmoid(logits)
    ce = targets * jax.nn.softplus(-logits) + (1 - targets) * jax.nn.softplus(logits)
    p_t = p * targets + (1 - p) * (1 - targets)
    loss = ce * (1 - p_t) ** gamma
    if alpha >= 0:
        loss = (alpha * targets + (1 - alpha) * (1 - targets)) * loss
    return loss


def ctr_diou_loss_1d(pred, target, eps: float = 1e-8):
    """Elementwise 1D DIoU (reference losses.py:108-168): same-center offset
    parameterization."""
    lp, rp = pred[..., 0], pred[..., 1]
    lg, rg = target[..., 0], target[..., 1]
    intsctk = jnp.minimum(lp, lg) + jnp.minimum(rp, rg)
    unionk = (lp + rp) + (lg + rg) - intsctk
    iouk = intsctk / jnp.maximum(unionk, eps)
    len_c = jnp.maximum(lp, lg) + jnp.maximum(rp, rg)
    rho = 0.5 * (rp - lp - rg + lg)
    return 1.0 - iouk + jnp.square(rho / jnp.maximum(len_c, eps))


def actionformer_init_extras(cfg):
    # explicit dtype => strong-typed: a weak-typed init would change the jit
    # signature after the first EMA update and force a silent re-compile
    return {"loss_normalizer": jnp.full((), _af_cfg(cfg).train_cfg.init_loss_norm,
                                        dtype=jnp.float32)}


def actionformer_loss(outputs, batch, cfg, extras):
    af = _af_cfg(cfg)
    tc = af.train_cfg
    points = jnp.asarray(_points(cfg))
    cls_t, reg_t = label_points(points, batch["gt_segments"], cfg)

    valid = outputs["fpn_mask"] * batch["sample_mask"][:, None]  # (B, P)
    pos = cls_t * valid

    num_pos = jnp.sum(pos)
    momentum = 0.9
    loss_normalizer = momentum * extras["loss_normalizer"] + (1 - momentum) * jnp.maximum(num_pos, 1.0)

    # focal cls loss with label smoothing (meta_archs.py:558-570)
    ls = tc.label_smoothing
    gt_target = cls_t * (1 - ls) + ls / (af.num_classes + 1)
    cls_loss = sigmoid_focal_loss(outputs["cls_logits"][..., 0], gt_target)
    cls_loss = jnp.sum(cls_loss * valid) / loss_normalizer

    # DIoU reg loss on positives (meta_archs.py:572-580)
    reg_t_pos = jnp.maximum(reg_t, 0.0)  # only read under pos mask; keep diou's domain valid
    reg_loss = ctr_diou_loss_1d(outputs["offsets"], reg_t_pos)
    reg_loss = jnp.sum(reg_loss * pos) / loss_normalizer
    reg_loss = jnp.where(num_pos == 0, 0.0, reg_loss)

    weight = tc.loss_weight if tc.loss_weight > 0 else 1.0
    final = cls_loss + reg_loss * weight
    # the reference's train engine steps on reg_loss ONLY — the cls head is
    # never trained there (train_engine_ActionFormer, models/ActionFormer.py:
    # 154-161, a genuine reference pathology).  Default is the meta-arch's
    # final_loss (meta_archs.py:588-592); set train_cfg.engine_loss: "reg"
    # for engine-exact trajectories.
    if str(tc.get("engine_loss", "final")) == "reg":
        final = reg_loss
    return final, {"loss_normalizer": loss_normalizer}


def _decode_candidates(outputs, cfg):
    """Decode logits/offsets into pre-NMS (segs, scores) — shared by the
    full protocol and the fast top-1 metric path."""
    af = _af_cfg(cfg)
    test = af.test_cfg
    points = jnp.asarray(_points(cfg))
    probs = jax.nn.sigmoid(outputs["cls_logits"][..., 0]) * outputs["fpn_mask"]  # (B, P)
    t, stride = points[None, :, 0], points[None, :, 3]
    seg_left = t - outputs["offsets"][..., 0] * stride
    seg_right = t + outputs["offsets"][..., 1] * stride
    segs = jnp.stack([seg_left, seg_right], axis=-1)  # (B, P, 2)

    # pre-NMS filtering (threshold + duration) via score zeroing (fixed shape)
    keep = (probs > test.pre_nms_thresh) & ((seg_right - seg_left) > test.duration_thresh)
    scores = jnp.where(keep, probs, 0.0)
    return segs, scores, test


def _decode_and_nms(outputs, cfg):
    """Shared decode + (soft-)NMS + voting over the whole batch on device.

    Returns (segs (B, K, 2) grid coords, scores (B, K), valid (B, K)) with
    K = test_cfg.max_seg_num, sorted by decayed score — the reference's
    inference_single_video + batched_nms class-agnostic path
    (meta_archs.py:641-706, actionformer_utils.py:103-190)."""
    segs, scores, test = _decode_candidates(outputs, cfg)
    K = int(test.max_seg_num)
    method_name = test.nms_method
    if method_name == "none":
        kept_scores, idx = jax.lax.top_k(scores, K)
        kept_segs = jnp.take_along_axis(segs, idx[..., None], axis=1)
        valids = kept_scores > 0
        return kept_segs, kept_scores, valids

    method = {"soft": 2, "linear": 1}.get(method_name, 0)
    kept_segs, kept_scores, valids = batched_nms_1d(
        segs, scores, test.iou_threshold, K, test.min_score, method, test.nms_sigma,
    )
    # seg voting on the class-agnostic path (actionformer_utils.py:173-180);
    # the shipped configs set multiclass_nms false + voting_thresh 0.9
    voting = float(getattr(test, "voting_thresh", 0.0) or 0.0)
    if voting > 0 and not bool(getattr(test, "multiclass_nms", False)):
        kept_segs = batched_seg_voting(kept_segs, segs, scores, voting)
    return kept_segs, kept_scores, valids


def _grid_to_seconds(segs, batch):
    """grid -> seconds, clipped to [0, duration] (meta_archs.py:736-741).
    segs: (B, ..., 2)."""
    expand = (slice(None),) + (None,) * (segs.ndim - 1)
    secs = (segs * batch["feat_stride"][expand] + 0.5 * batch["feat_num_frames"][expand]) \
        / batch["fps"][expand]
    return jnp.clip(secs, 0.0, batch["duration"][expand])


def actionformer_infer(outputs, batch, cfg):
    """Top-1 span as duration FRACTIONS so the shared VMR metric engine
    applies (reference inference + postprocessing restricted to top-1).

    EXACT shortcut (tests/test_actionformer.py::test_fast_top1_matches_full):
    greedy (soft-)NMS's FIRST pick is the plain argmax of the pre-NMS scores
    — decay only affects later picks, and later picks can never outscore an
    earlier one — so the R1 metric path skips the max_seg_num-step scan
    entirely (it was 55% of the eval step at the shipped config) and applies
    seg_voting directly to the argmax segment.  Serving/export use
    ``actionformer_infer_full`` for the complete ranked list."""
    segs, scores, test = _decode_candidates(outputs, cfg)
    idx = jnp.argmax(scores, axis=1)
    top = jnp.take_along_axis(segs, idx[:, None, None], axis=1)  # (B, 1, 2)
    voting = float(getattr(test, "voting_thresh", 0.0) or 0.0)
    if test.nms_method != "none" and voting > 0 \
            and not bool(getattr(test, "multiclass_nms", False)):
        top = batched_seg_voting(top, segs, scores, voting)
    # degenerate case: every candidate fell below pre_nms_thresh (scores all
    # zeroed) — the NMS path yields valid=False/zero segments; match it
    # instead of emitting argmax's arbitrary cell-0 segment
    any_valid = scores.max(axis=1) > 0
    top = jnp.where(any_valid[:, None, None], top, 0.0)
    secs = _grid_to_seconds(top[:, 0], batch)
    return secs / batch["duration"][:, None]


def actionformer_infer_full(outputs, batch, cfg):
    """The full ActionFormer protocol: top ``test_cfg.max_seg_num`` segments
    per video.  Returns {'segments': (B, K, 2) seconds, 'scores': (B, K),
    'valid': (B, K)} — the batched equivalent of the reference's
    postprocessing output list (meta_archs.py:708-750)."""
    kept_segs, kept_scores, valids = _decode_and_nms(outputs, cfg)
    return {
        "segments": _grid_to_seconds(kept_segs, batch),
        "scores": kept_scores,
        "valid": valids,
    }


from vmrframe_tpu.data.af_batcher import ActionFormerBatcher  # noqa: E402

register_model(
    "ActionFormer",
    loss_fn=actionformer_loss,
    infer_fn=actionformer_infer,
    stateful=True,
    init_extras=actionformer_init_extras,
    batcher_cls=ActionFormerBatcher,
    # round-4 on-chip A/B: tree-chain AdamW 8.8 vs flat 11.8 ms/step at
    # charades dims (docs/BENCH_ZOO.json ActionFormer_{treeopt,flatfix})
    optimizer_impl="tree",
)(ActionFormer)
