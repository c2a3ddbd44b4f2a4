"""BackBone — SeqPAN minus the sequence-matching head (reference
models/BackBone.py): separate text encoder (4 layers), dual attention kept,
loc loss only."""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
from flax import linen as nn

from vmrframe_tpu.layers import SeqPANPredictor
from vmrframe_tpu.losses import lossfun_loc
from vmrframe_tpu.models.common import encode_and_fuse
from vmrframe_tpu.ops.span import infer_span_1d
from vmrframe_tpu.registry import register_model


class BackBone(nn.Module):
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
        slogits, elogits = SeqPANPredictor(m.dim, m.vlen, num_heads=4, droprate=m.droprate,
                                           name="predictor")(fuse_feat, vmask, deterministic)
        return {"slogits": slogits, "elogits": elogits, "vmask": vmask}


def backbone_loss(outputs: Dict[str, jnp.ndarray], batch: Dict[str, jnp.ndarray], cfg) -> jnp.ndarray:
    label1ds = batch["label1ds"]
    return lossfun_loc(outputs["slogits"], outputs["elogits"], label1ds[:, 0, :], label1ds[:, 1, :],
                       batch["vmasks"], batch.get("sample_mask"))


def backbone_infer(outputs, batch, cfg):
    return infer_span_1d(outputs["slogits"], outputs["elogits"], outputs["vmask"])


register_model("BackBone", loss_fn=backbone_loss, infer_fn=backbone_infer)(BackBone)
