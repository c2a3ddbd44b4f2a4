"""BackBoneActionFormer — BackBone + an ActionFormer ConvTransformerBackbone
inserted after the cross-modal fusion (reference
models/BackBoneActionFormer.py:43-91): the fused features pass through a
conv-transformer with local window attention (arch [2,2,3], windows
[5,5,5,-1], abs PE) and only pyramid level 0 feeds the SeqPAN predictor.
Loc loss only."""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
from flax import linen as nn

from vmrframe_tpu.layers import SeqPANPredictor
from vmrframe_tpu.layers.actionformer import ConvTransformerBackbone
from vmrframe_tpu.losses import lossfun_loc
from vmrframe_tpu.models.common import encode_and_fuse
from vmrframe_tpu.ops.span import infer_span_1d
from vmrframe_tpu.registry import register_model


class BackBoneActionFormer(nn.Module):
    cfg: Any
    derived: Any
    word_vectors: Any

    @nn.compact
    def __call__(self, batch: Dict[str, jnp.ndarray], deterministic: bool = True) -> Dict[str, jnp.ndarray]:
        m = self.cfg.model
        vmask = batch["vmasks"]
        _, _, fuse_feat = encode_and_fuse(
            self.cfg, self.derived, self.word_vectors, batch, deterministic,
            shared_encoder=False, encoder_layers=4, use_dual_attention=True,
        )
        # hard-coded backbone config mirroring the reference (:43-60), with
        # dims/length tied to the model config instead of literal 128/64
        feats, masks = ConvTransformerBackbone(
            n_in=m.dim, n_embd=m.dim, n_head=4, n_embd_ks=3, max_len=m.vlen,
            arch=(2, 2, 3), mha_win_size=(5, 5, 5, -1), scale_factor=2,
            with_ln=True, attn_pdrop=0.0, proj_pdrop=0.0, path_pdrop=0.1,
            use_abs_pe=True, name="backbone",
        )(fuse_feat, vmask, deterministic)
        fuse_feat, vmask = feats[0], masks[0]  # pyramid level 0 only (:89-91)
        slogits, elogits = SeqPANPredictor(m.dim, m.vlen, num_heads=4, droprate=m.droprate,
                                           name="predictor")(fuse_feat, vmask, deterministic)
        return {"slogits": slogits, "elogits": elogits, "vmask": vmask}


def bbaf_loss(outputs, batch, cfg):
    label1ds = batch["label1ds"]
    return lossfun_loc(outputs["slogits"], outputs["elogits"], label1ds[:, 0, :], label1ds[:, 1, :],
                       batch["vmasks"], batch.get("sample_mask"))


def bbaf_infer(outputs, batch, cfg):
    return infer_span_1d(outputs["slogits"], outputs["elogits"], outputs["vmask"])


register_model("BackBoneActionFormer", loss_fn=bbaf_loss, infer_fn=bbaf_infer)(BackBoneActionFormer)
