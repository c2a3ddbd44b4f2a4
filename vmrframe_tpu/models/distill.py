"""Teacher→student distillation family (reference models/OneTeacher*.py,
MultiTeacher.py, BaseFast_BAN_{PreTrain,CoTrain}.py, BaseFast_CCA_PreTrain.py).

The shared STUDENT is the BaseFast-style tower with a 4-layer shared encoder
and no dual attention (OneTeacher.py:18-31).  Variants:

- OneTeacher: student + a full SeqPAN teacher tower trained JOINTLY in one
  module; loss = teacher hard + student hard + softloc(student ‖ teacher).
  NB the reference adds the per-sample (B,) softloc vector to a scalar loss
  and would crash at loss.backward(); we take the batch mean (the intent).
- OneTeacher_SoftLabel / BaseFast_BAN_CoTrain: student + a FROZEN pretrained
  SeqPAN teacher loaded from configs.teacher0.model.checkpoint (ours is an
  orbax checkpoint).  Teacher params get zero optimizer updates
  (registry.frozen_filter), mirroring requires_grad=False.
- BaseFast_BAN_PreTrain: student + frozen BAN teacher.  The reference feeds
  the BAN teacher SeqPAN-style arguments and reads keys BAN never returns
  (BaseFast_BAN_PreTrain.py:75-77 — it cannot run); we run the BAN teacher
  on its real inputs and derive 1D s/e teacher curves as the row/col max of
  its sigmoid tmap (the generate_CCA_label.py conversion).
- MultiTeacher: student distilled from THREE precomputed teacher-logit
  pickles with per-teacher adaptive coefficients = IoU(teacher argmax span,
  gt span) (MultiTeacher.py:151-193).  Student loc/softloc use
  sigmoid(logits) (MultiTeacher.py:171-174).
- BaseFast_CCA_PreTrain: student + teacher s/e curves shipped in the batch
  (label1ds_t0 from a CCA-teacher pickle).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from vmrframe_tpu.config import Config
from vmrframe_tpu.layers import SeqPANPredictor
from vmrframe_tpu.losses import lossfun_loc, lossfun_match, lossfun_softloc
from vmrframe_tpu.models.common import encode_and_fuse
from vmrframe_tpu.models.seqpan import SeqPAN, match_head
from vmrframe_tpu.ops.span import infer_span_1d
from vmrframe_tpu.registry import register_model


def _student_forward(module, cfg, derived, word_vectors, batch, deterministic):
    """The shared student tower -> outputs dict."""
    m = cfg.model
    vmask = batch["vmasks"]
    _, _, fuse_feat = encode_and_fuse(
        cfg, derived, word_vectors, batch, deterministic,
        shared_encoder=True, encoder_layers=4, use_dual_attention=False,
    )
    fuse_feat, match_score, match_probs, label_embs = match_head(
        module, fuse_feat, vmask, m.dim, deterministic
    )
    slogits, elogits = SeqPANPredictor(m.dim, m.vlen, num_heads=4, droprate=m.droprate,
                                       name="predictor")(fuse_feat, vmask, deterministic)
    return {
        "slogits": slogits,
        "elogits": elogits,
        "vmask": vmask,
        "match_score": match_score,
        "label_embs": label_embs,
    }


def _teacher_cfg(cfg) -> Config:
    """Build the teacher's Config: parent tree with teacher0.model spliced in."""
    data = cfg.to_dict()
    data["model"] = cfg.teacher0.model.to_dict()
    return Config(data)


def _student_hard_loss(outputs, batch, sample_mask):
    label1ds = batch["label1ds"]
    loc = lossfun_loc(outputs["slogits"], outputs["elogits"], label1ds[:, 0, :],
                      label1ds[:, 1, :], batch["vmasks"], sample_mask)
    match = lossfun_match(outputs["match_score"], outputs["label_embs"],
                          batch["NER_labels"], batch["vmasks"], sample_mask)
    return loc + match


def _mean_softloc(s, e, st, et, vmask, temperature, sample_mask):
    per = lossfun_softloc(s, e, st, et, vmask, temperature)
    if sample_mask is None:
        return jnp.mean(per)
    return jnp.sum(per * sample_mask) / jnp.maximum(jnp.sum(sample_mask), 1.0)


def _infer(outputs, batch, cfg):
    return infer_span_1d(outputs["slogits"], outputs["elogits"], outputs["vmask"])


# ------------------------------------------------------------- OneTeacher


class OneTeacher(nn.Module):
    cfg: Any
    derived: Any
    word_vectors: Any

    @nn.compact
    def __call__(self, batch: Dict[str, jnp.ndarray], deterministic: bool = True):
        teacher = SeqPAN(cfg=self.cfg, derived=self.derived, word_vectors=self.word_vectors,
                         name="teacher_t0")(batch, deterministic)
        student = _student_forward(self, self.cfg, self.derived, self.word_vectors,
                                   batch, deterministic)
        student.update({
            "slogits_t0": teacher["slogits"],
            "elogits_t0": teacher["elogits"],
            "match_score_t0": teacher["match_score"],
            "label_embs_t0": teacher["label_embs"],
        })
        return student


def oneteacher_loss(outputs, batch, cfg):
    sample_mask = batch.get("sample_mask")
    label1ds = batch["label1ds"]
    loc_t0 = lossfun_loc(outputs["slogits_t0"], outputs["elogits_t0"], label1ds[:, 0, :],
                         label1ds[:, 1, :], batch["vmasks"], sample_mask)
    match_t0 = lossfun_match(outputs["match_score_t0"], outputs["label_embs_t0"],
                             batch["NER_labels"], batch["vmasks"], sample_mask)
    hard = _student_hard_loss(outputs, batch, sample_mask)
    kd = _mean_softloc(outputs["slogits"], outputs["elogits"], outputs["slogits_t0"],
                       outputs["elogits_t0"], batch["vmasks"], cfg.loss.temperature, sample_mask)
    return loc_t0 + match_t0 + hard + kd


register_model("OneTeacher", loss_fn=oneteacher_loss, infer_fn=_infer)(OneTeacher)


# --------------------------------------------- frozen-SeqPAN-teacher pair


class _FrozenSeqPANStudent(nn.Module):
    cfg: Any
    derived: Any
    word_vectors: Any

    @nn.compact
    def __call__(self, batch: Dict[str, jnp.ndarray], deterministic: bool = True):
        student = _student_forward(self, self.cfg, self.derived, self.word_vectors,
                                   batch, deterministic)
        tcfg = _teacher_cfg(self.cfg)
        teacher = SeqPAN(cfg=tcfg, derived=self.derived, word_vectors=self.word_vectors,
                         name="teach_model")(batch, deterministic)
        student["slogits_t0"] = jax.lax.stop_gradient(teacher["slogits"])
        student["elogits_t0"] = jax.lax.stop_gradient(teacher["elogits"])
        return student


class OneTeacher_SoftLabel(_FrozenSeqPANStudent):
    pass


class BaseFast_BAN_CoTrain(_FrozenSeqPANStudent):
    """Despite the name, the reference's CoTrain variant uses a frozen
    SeqPAN teacher (BaseFast_BAN_CoTrain.py:37)."""


def softlabel_loss(outputs, batch, cfg):
    sample_mask = batch.get("sample_mask")
    hard = _student_hard_loss(outputs, batch, sample_mask)
    kd = _mean_softloc(outputs["slogits"], outputs["elogits"], outputs["slogits_t0"],
                       outputs["elogits_t0"], batch["vmasks"], cfg.loss.temperature, sample_mask)
    return hard + kd


def _teacher_frozen(path: str) -> bool:
    return path.startswith("teach_model")


def load_teacher_hook(state, cfg, trainer):
    """Load a pretrained teacher checkpoint (our orbax format) into
    params['teach_model'] when configs.teacher0.model.checkpoint exists."""
    import os

    ckpt = cfg.teacher0.model.get("checkpoint", "")
    if not ckpt or not os.path.exists(str(ckpt)):
        return state
    from vmrframe_tpu.train.checkpoints import load_checkpoint
    from vmrframe_tpu.train.trainer import TrainState

    restored = load_checkpoint(ckpt)
    params = dict(state.params)
    params["teach_model"] = jax.tree_util.tree_map(
        lambda o, n: jnp.asarray(n, o.dtype), state.params["teach_model"], restored["params"]
    )
    return TrainState(params, state.constants, state.opt_state, state.step, state.extras)


register_model("OneTeacher_SoftLabel", loss_fn=softlabel_loss, infer_fn=_infer,
               frozen_filter=_teacher_frozen, init_hook=load_teacher_hook)(OneTeacher_SoftLabel)
register_model("BaseFast_BAN_CoTrain", loss_fn=softlabel_loss, infer_fn=_infer,
               frozen_filter=_teacher_frozen, init_hook=load_teacher_hook)(BaseFast_BAN_CoTrain)


# ----------------------------------------------- frozen-BAN-teacher pair


class BaseFast_BAN_PreTrain(nn.Module):
    cfg: Any
    derived: Any
    word_vectors: Any

    @nn.compact
    def __call__(self, batch: Dict[str, jnp.ndarray], deterministic: bool = True):
        from vmrframe_tpu.models.ban import BAN

        student = _student_forward(self, self.cfg, self.derived, self.word_vectors,
                                   batch, deterministic)
        tcfg = _teacher_cfg(self.cfg)
        tout = BAN(cfg=tcfg, derived=self.derived, word_vectors=self.word_vectors,
                   name="teach_model")(batch, deterministic)
        # 1D teacher curves from the 2D map: row/col max of sigmoid(tmap)
        # over valid cells (the generate_CCA_label.py conversion)
        smap = jax.nn.sigmoid(tout["tmap"]) * tout["map2d_mask"][None].astype(jnp.float32)
        student["slogits_t0"] = jax.lax.stop_gradient(jnp.max(smap, axis=2))
        student["elogits_t0"] = jax.lax.stop_gradient(jnp.max(smap, axis=1))
        return student


register_model("BaseFast_BAN_PreTrain", loss_fn=softlabel_loss, infer_fn=_infer,
               frozen_filter=_teacher_frozen, init_hook=load_teacher_hook)(BaseFast_BAN_PreTrain)


# ------------------------------------------------------------ MultiTeacher


class MultiTeacher(nn.Module):
    cfg: Any
    derived: Any
    word_vectors: Any

    @nn.compact
    def __call__(self, batch: Dict[str, jnp.ndarray], deterministic: bool = True):
        return _student_forward(self, self.cfg, self.derived, self.word_vectors,
                                batch, deterministic)


def calculate_adapt_cof(t_label, gt_label):
    """Per-sample IoU between the teacher-argmax span and the gt-argmax span
    (MultiTeacher.py:151-159)."""
    ts = jnp.argmax(t_label[:, 0, :], axis=1)
    te = jnp.argmax(t_label[:, 1, :], axis=1)
    gs = jnp.argmax(gt_label[:, 0, :], axis=1)
    ge = jnp.argmax(gt_label[:, 1, :], axis=1)
    inter = jnp.minimum(te, ge) - jnp.maximum(ts, gs)
    union = jnp.maximum(te, ge) - jnp.minimum(ts, gs)
    return jnp.clip(inter / jnp.where(union == 0, 1, union), 0.0, 1.0)


def multiteacher_loss(outputs, batch, cfg):
    sample_mask = batch.get("sample_mask")
    label1ds = batch["label1ds"]
    vmasks = batch["vmasks"]
    s_sig = jax.nn.sigmoid(outputs["slogits"])
    e_sig = jax.nn.sigmoid(outputs["elogits"])
    loss = lossfun_loc(s_sig, e_sig, label1ds[:, 0, :], label1ds[:, 1, :], vmasks, sample_mask)

    for t in ("t0", "t1", "t2"):
        key = f"label1d_{t}s"
        if key not in batch:
            continue
        t_lab = batch[key]
        per = lossfun_softloc(s_sig, e_sig, t_lab[:, 0, :], t_lab[:, 1, :], vmasks,
                              cfg.loss.get(f"{t}_temperature"))
        cof = calculate_adapt_cof(t_lab, label1ds)
        weighted = cof * per
        if sample_mask is not None:
            term = jnp.sum(weighted * sample_mask) / jnp.maximum(jnp.sum(sample_mask), 1.0)
        else:
            term = jnp.mean(weighted)
        loss = loss + term * cfg.loss.get(f"{t}_cof")
    return loss


from vmrframe_tpu.data.distill_batcher import CCAPreTrainBatcher, MultiTeacherBatcher  # noqa: E402

register_model("MultiTeacher", loss_fn=multiteacher_loss, infer_fn=_infer,
               batcher_cls=MultiTeacherBatcher)(MultiTeacher)


# ------------------------------------------------- BaseFast_CCA_PreTrain


class BaseFast_CCA_PreTrain(nn.Module):
    cfg: Any
    derived: Any
    word_vectors: Any

    @nn.compact
    def __call__(self, batch: Dict[str, jnp.ndarray], deterministic: bool = True):
        return _student_forward(self, self.cfg, self.derived, self.word_vectors,
                                batch, deterministic)


def cca_pretrain_loss(outputs, batch, cfg):
    """Student hard losses + softloc vs the batch-shipped teacher curves
    (BaseFast_CCA_PreTrain.py:142-163; note [:, :, 0/1] indexing — curves
    stored time-major)."""
    sample_mask = batch.get("sample_mask")
    hard = _student_hard_loss(outputs, batch, sample_mask)
    t0 = batch["label1ds_t0"]
    kd = _mean_softloc(outputs["slogits"], outputs["elogits"], t0[:, :, 0], t0[:, :, 1],
                       batch["vmasks"], cfg.loss.temperature, sample_mask)
    return hard + kd


register_model("BaseFast_CCA_PreTrain", loss_fn=cca_pretrain_loss, infer_fn=_infer,
               batcher_cls=CCAPreTrainBatcher)(BaseFast_CCA_PreTrain)
