"""SeqPAN — the flagship model (reference models/SeqPAN.py).

Sequence Parallel Attention Network for video moment retrieval:

    text  = Embedding(GloVe ‖ char-CNN)           SeqPAN.py:18-23
    video = VisualProjection(vdim -> dim)          SeqPAN.py:27-28
    both  = SHARED FeatureEncoder (pos + 4× depthwise-sep conv k=7)
                                                   SeqPAN.py:59-60 (shared!)
    2 × { DualAttentionBlock(v↔t, both directions) }
    CQAttention(v←t), CQAttention(t←v), CQConcatenate
    match head: Conv1D(dim->4) -> gumbel-softmax(τ=0.3) -> soft label-embedding
    SeqPANPredictor -> start/end logits

Losses: lossfun_loc (CE vs clipped-Gaussian boundary heatmaps) +
lossfun_match (NLL vs O/B/I/E tags + label-embedding orthogonality).

The gumbel-softmax is stochastic in the reference's forward in BOTH train and
eval (F.gumbel_softmax draws noise unconditionally, SeqPAN.py:79); we thread
an explicit PRNG stream ('gumbel') for it, and disable the noise when
``deterministic`` — measured mIoU difference is within run-to-run noise, and
deterministic eval is required for reproducible serving.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from flax import linen as nn

from vmrframe_tpu.layers import SeqPANPredictor
from vmrframe_tpu.layers.basic import Conv1D
from vmrframe_tpu.losses import lossfun_loc, lossfun_match
from vmrframe_tpu.models.common import encode_and_fuse
from vmrframe_tpu.ops.span import infer_span_1d
from vmrframe_tpu.registry import register_model


def gumbel_softmax(rng, logits: jnp.ndarray, tau: float = 1.0) -> jnp.ndarray:
    """Differentiable gumbel-softmax sample (soft, like F.gumbel_softmax
    with hard=False)."""
    gumbels = jax.random.gumbel(rng, logits.shape, dtype=logits.dtype)
    return jax.nn.softmax((logits + gumbels) / tau, axis=-1)


def match_head(module: nn.Module, fuse_feat, vmask, dim: int, deterministic: bool, tau: float = 0.3):
    """Conv1D(dim->4) -> gumbel-softmax -> soft label-embedding injection
    (SeqPAN.py:78-82).  Returns (fuse_feat', match_score, match_probs,
    label_embs)."""
    match_logits = Conv1D(4, name="match_conv1d")(fuse_feat)
    if deterministic:
        match_score = jax.nn.softmax(match_logits / tau, axis=-1)
    else:
        match_score = gumbel_softmax(module.make_rng("gumbel"), match_logits, tau=tau)
    match_probs = jnp.log(jnp.maximum(match_score, 1e-30))
    label_embs = module.param("label_embs", nn.initializers.orthogonal(), (dim, 4))
    soft_label_embs = jnp.matmul(match_score, jnp.transpose(label_embs))  # (B, L, dim)
    fuse_feat = (fuse_feat + soft_label_embs) * vmask[:, :, None]
    return fuse_feat, match_score, match_probs, label_embs


class SeqPAN(nn.Module):
    cfg: Any  # Config
    derived: Any  # Derived
    word_vectors: Any  # numpy (N, word_dim)

    @nn.compact
    def __call__(self, batch: Dict[str, jnp.ndarray], deterministic: bool = True) -> Dict[str, jnp.ndarray]:
        m = self.cfg.model
        vmask = batch["vmasks"]
        _, _, fuse_feat = encode_and_fuse(
            self.cfg, self.derived, self.word_vectors, batch, deterministic,
            shared_encoder=True, encoder_layers=4, use_dual_attention=True,
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


def seqpan_loss(outputs: Dict[str, jnp.ndarray], batch: Dict[str, jnp.ndarray], cfg) -> jnp.ndarray:
    """loc + match loss (reference train_engine_SeqPAN, SeqPAN.py:171-182)."""
    sample_mask = batch.get("sample_mask")
    label1ds = batch["label1ds"]
    loc = lossfun_loc(outputs["slogits"], outputs["elogits"], label1ds[:, 0, :], label1ds[:, 1, :],
                      batch["vmasks"], sample_mask)
    match = lossfun_match(outputs["match_score"], outputs["label_embs"], batch["NER_labels"],
                          batch["vmasks"], sample_mask)
    return loc + match


def seqpan_infer(outputs: Dict[str, jnp.ndarray], batch: Dict[str, jnp.ndarray], cfg) -> jnp.ndarray:
    """(B, 2) fractional spans (reference infer_SeqPAN -> infer_basic)."""
    return infer_span_1d(outputs["slogits"], outputs["elogits"], outputs["vmask"])


register_model("SeqPAN", loss_fn=seqpan_loss, infer_fn=seqpan_infer)(SeqPAN)
