"""CPL — weakly-supervised Contrastive Proposal Learning
(reference models/model.py:74-200 + models/cpl_lib.py + utils/engine.py:8-90).

A Gaussian proposal generator (learned attention pooling over time ->
2P sigmoid params per video) defines P soft temporal proposals; a two-stage
gauss-weighted transformer decoder reconstructs the masked query words under
each proposal's attention weighting; training minimizes the best proposal's
reconstruction NLL plus a proposal-diversity penalty.  No boundary labels
are used — weak supervision only.

Inference (infer_CPL, engine.py:71-90): per-proposal reconstruction NLL,
pick the argmin proposal, span = [center - width/2, center + width/2].

The reference has no CPL dataset/collate (eval('CPLDataset') NameErrors,
utils/DataLoader.py:5); we drive it from the standard batcher.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from vmrframe_tpu.layers.dropout import Dropout

from vmrframe_tpu.layers import VisualProjection
from vmrframe_tpu.layers.basic import WordEmbedding, torch_linear_init
from vmrframe_tpu.layers.cpl_decoder import TransformerDecoder
from vmrframe_tpu.losses import div_loss_cpl, rec_loss_cpl, cal_nll_loss
from vmrframe_tpu.ops.precision import biased
from vmrframe_tpu.registry import register_model


def _num_props(cfg) -> int:
    if "others" in cfg:
        return int(cfg.others.get("cpl_num_props", 8))
    return 8


def generate_gauss_weight(props_len: int, center, width, vmask):
    """(BP,) center/width in [0,1] -> (BP, L) max-normalized Gaussians over
    the VALID portion of each clip (model.py:180-195)."""
    pos = jnp.linspace(0, 1, props_len)[None, :]
    frac = jnp.sum(vmask, axis=1) / vmask.shape[1]
    c = (center * frac)[:, None]
    w = jnp.maximum((width * frac), 1e-2)[:, None] / 9
    weight = 0.3989422804014327 / w * jnp.exp(-jnp.square(pos - c) / (2 * w * w))
    return weight / jnp.max(weight, axis=-1, keepdims=True)


class CPL(nn.Module):
    cfg: Any
    derived: Any
    word_vectors: Any

    @nn.compact
    def __call__(self, batch: Dict[str, jnp.ndarray], deterministic: bool = True):
        m = self.cfg.model
        dim = m.dim
        P = _num_props(self.cfg)
        word_ids, tmask, vmask = batch["words_ids"], batch["tmasks"], batch["vmasks"]
        B, L = vmask.shape

        vfeat = VisualProjection(dim, m.droprate, name="video_affine")(batch["vfeats"], deterministic)

        # word features with a trainable START vector prepended (model.py:139-146)
        words_feat = WordEmbedding(m.word_dim, self.word_vectors, 0.0, name="word_emb")(
            word_ids, deterministic)
        start_vec = self.param("start_vec", nn.initializers.zeros, (m.word_dim,))
        # start_vec is an f32 vector param (ops/precision.py): cast at the
        # concat so it can't promote the whole text branch under bf16
        words_feat = jnp.concatenate(
            [jnp.broadcast_to(start_vec[None, None].astype(words_feat.dtype),
                              (B, 1, m.word_dim)), words_feat], axis=1)
        words_feat = Dropout(0.1)(words_feat, deterministic=deterministic)
        wf_kernel = self.param("word_fc_kernel", torch_linear_init, (m.word_dim, dim))
        wf_bias = self.param("word_fc_bias", nn.initializers.zeros, (dim,))
        tfeat_long = biased(words_feat @ wf_kernel, wf_bias)  # (B, T+1, dim)
        # mask over T+1 slots: word count + start token (cpl_lib._generate_mask)
        lens = jnp.sum(tmask, axis=1).astype(jnp.int32) + 1
        tmask_long = (jnp.arange(word_ids.shape[1] + 1)[None, :]
                      < lens[:, None]).astype(vfeat.dtype)

        # proposal generator: learned pooling over time -> 2P sigmoid params
        cw_kernel = self.param("conv1d_cw_kernel", torch_linear_init, (L, 1))
        cw_bias = self.param("conv1d_cw_bias", nn.initializers.zeros, (1,))
        weakly = biased(jnp.einsum("bld,lo->bod", vfeat, cw_kernel).squeeze(1),
                        cw_bias)  # (B, dim)
        fg_kernel = self.param("fc_gauss_kernel", torch_linear_init, (dim, P * 2))
        fg_bias = self.param("fc_gauss_bias", nn.initializers.zeros, (P * 2,))
        gauss = jax.nn.sigmoid(biased(weakly @ fg_kernel, fg_bias)).reshape(B * P, 2)
        center, width = gauss[:, 0], gauss[:, 1]

        vmask_props = jnp.repeat(vmask, P, axis=0)
        # Gaussian math runs f32 (exp/divide precision), the attention
        # reweighting consumes it in the activation dtype
        gauss_weight = generate_gauss_weight(
            L, center.astype(jnp.float32), width.astype(jnp.float32),
            vmask_props.astype(jnp.float32))
        pos_weight = (gauss_weight
                      / jnp.max(gauss_weight, axis=-1, keepdims=True)).astype(vfeat.dtype)

        # shared-prefix: the P proposal rows of one clip are IDENTICAL until
        # the per-proposal Gaussian reweights the attention, so each
        # decoder's first layer computes q/k/v + logits + softmax once per
        # clip, not once per proposal (exact — see cpl_decoder.py; the
        # reference repeats the inputs 8x, models/model.py:150-166).
        # Default (True/"always"): shared in BOTH modes — round-4 on-chip A/B
        # (docs/BENCH_ZOO.json): train 28.15 -> 22.62 ms/step (1.24x, GFLOPs
        # 71.4 -> 62.4), eval 1.25x; dropout masks stay independent per
        # (b, p) row (probs formed per proposal after the shared softmax),
        # and with droprate=0 the trajectory is exactly the repeated path's
        # (tests/test_reference_trainer_parity_zoo.py pins it vs torch).
        # "eval": shared in deterministic mode only (the rounds-2/3 default,
        # from a CPU A/B that the chip measurement reversed).  False: the
        # reference-shaped repeated path everywhere.
        sp = self.cfg.others.get("cpl_shared_prefix", True) \
            if "others" in self.cfg else True
        shared = sp == "always" or (bool(sp) and (deterministic or sp is True))
        # remat (opt-in memory lever): replay the decoder layers inside the
        # backward instead of saving the (B·P, H, Tq, Tk) prob-map residuals.
        # On-chip it's SLOWER at shipped dims (28.2 -> 37.2 ms/step, round-4
        # A/B in docs/BENCH_ZOO.json) — see layers/cpl_decoder.py for the
        # measurement; use only when residuals would not fit HBM
        rm = bool(self.cfg.others.get("cpl_remat", False)) \
            if "others" in self.cfg else False
        if shared:
            enc_out, _ = TransformerDecoder(2, dim, 4, 0.1, remat=rm, name="decoder1")(
                None, None, vfeat, vmask, tgt_gauss_weight=pos_weight,
                deterministic=deterministic, n_props=P)
            out, _ = TransformerDecoder(2, dim, 4, 0.1, remat=rm, name="decoder2")(
                enc_out, vmask_props, tfeat_long[:, :-1], tmask_long[:, :-1],
                src_gauss_weight=pos_weight, deterministic=deterministic, n_props=P)
        else:
            vfeat_props = jnp.repeat(vfeat, P, axis=0)
            tmask_props = jnp.repeat(tmask_long[:, :-1], P, axis=0)
            tfeat_props = jnp.repeat(tfeat_long[:, :-1], P, axis=0)
            enc_out, _ = TransformerDecoder(2, dim, 4, 0.1, remat=rm, name="decoder1")(
                None, None, vfeat_props, vmask_props, tgt_gauss_weight=pos_weight,
                deterministic=deterministic)
            out, _ = TransformerDecoder(2, dim, 4, 0.1, remat=rm, name="decoder2")(
                enc_out, vmask_props, tfeat_props, tmask_props,
                src_gauss_weight=pos_weight, deterministic=deterministic)
        fc_kernel = self.param("fc_comp_kernel", torch_linear_init, (dim, self.derived.num_words))
        fc_bias = self.param("fc_comp_bias", nn.initializers.zeros, (self.derived.num_words,))
        words_logit = biased(out @ fc_kernel, fc_bias)  # (B*P, T, V)

        return {
            "word_ids": word_ids,
            "words_mask": tmask_long[:, :-1],
            "words_logit": words_logit,
            "width": width,
            "center": center,
            "gauss_weight": gauss_weight,
            "vmask": vmask,
        }


def cpl_loss(outputs, batch, cfg):
    """rec (min over proposals) + diversity (engine.py:8-26)."""
    P = _num_props(cfg)
    others = cfg.others if "others" in cfg else None
    lam = others.get("cpl_div_lambda", 0.15) if others else 0.15
    alpha = others.get("cpl_div_loss_alhpa", 1.0) if others else 1.0  # sic, reference key
    rec = rec_loss_cpl(outputs["words_logit"], outputs["word_ids"], outputs["words_mask"], P)
    div = div_loss_cpl(outputs["gauss_weight"], P, lam, alpha)
    return rec + div


def cpl_infer(outputs, batch, cfg):
    """Pick the min-NLL proposal, span = center ± width/2 (engine.py:71-90)."""
    P = _num_props(cfg)
    logit = outputs["words_logit"]
    B = logit.shape[0] // P
    ids = jnp.repeat(outputs["word_ids"], P, axis=0)
    mask = jnp.repeat(outputs["words_mask"], P, axis=0)
    nll, _ = cal_nll_loss(logit, ids, mask)
    best = jnp.argmin(nll.reshape(B, P), axis=-1)
    width = outputs["width"].reshape(B, P)[jnp.arange(B), best]
    center = outputs["center"].reshape(B, P)[jnp.arange(B), best]
    return jnp.stack([jnp.clip(center - width / 2, 0.0), jnp.clip(center + width / 2, None, 1.0)],
                     axis=1)


register_model("CPL", loss_fn=cpl_loss, infer_fn=cpl_infer)(CPL)
