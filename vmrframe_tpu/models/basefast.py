"""BaseFast — SeqPAN ablation (reference models/BaseFast.py).

Differences vs SeqPAN: the two dual-attention blocks are skipped (the
reference still constructs them but never calls them, BaseFast.py:62-69 —
inert parameters we don't create), the shared encoder has 2 conv layers
instead of 4, and the loc loss applies a sigmoid to the logits before the
soft CE (BaseFast.py:119-123).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from flax import linen as nn

from vmrframe_tpu.layers import SeqPANPredictor
from vmrframe_tpu.losses import lossfun_loc, lossfun_match
from vmrframe_tpu.models.common import encode_and_fuse
from vmrframe_tpu.models.seqpan import match_head
from vmrframe_tpu.ops.span import infer_span_1d
from vmrframe_tpu.registry import register_model


class BaseFast(nn.Module):
    cfg: Any
    derived: Any
    word_vectors: Any

    @nn.compact
    def __call__(self, batch: Dict[str, jnp.ndarray], deterministic: bool = True) -> Dict[str, jnp.ndarray]:
        m = self.cfg.model
        vmask = batch["vmasks"]
        _, _, fuse_feat = encode_and_fuse(
            self.cfg, self.derived, self.word_vectors, batch, deterministic,
            shared_encoder=True, encoder_layers=2, use_dual_attention=False,
        )
        fuse_feat, match_score, match_probs, label_embs = match_head(
            self, fuse_feat, vmask, m.dim, deterministic
        )
        slogits, elogits = SeqPANPredictor(m.dim, m.vlen, num_heads=4, droprate=m.droprate,
                                           name="predictor")(fuse_feat, vmask, deterministic)
        return {
            "slogits": slogits,
            "elogits": elogits,
            "vmask": vmask,
            "match_score": match_score,
            "match_probs": match_probs,
            "label_embs": label_embs,
        }


def basefast_loss(outputs: Dict[str, jnp.ndarray], batch: Dict[str, jnp.ndarray], cfg) -> jnp.ndarray:
    """sigmoid(logits) fed into the soft CE + match loss (BaseFast.py:112-127)."""
    sample_mask = batch.get("sample_mask")
    label1ds = batch["label1ds"]
    loc = lossfun_loc(
        jax.nn.sigmoid(outputs["slogits"]),
        jax.nn.sigmoid(outputs["elogits"]),
        label1ds[:, 0, :], label1ds[:, 1, :], batch["vmasks"], sample_mask,
    )
    match = lossfun_match(outputs["match_score"], outputs["label_embs"], batch["NER_labels"],
                          batch["vmasks"], sample_mask)
    return loc + match


def basefast_infer(outputs, batch, cfg):
    return infer_span_1d(outputs["slogits"], outputs["elogits"], outputs["vmask"])


register_model("BaseFast", loss_fn=basefast_loss, infer_fn=basefast_infer)(BaseFast)
