"""Sentence-embedding model variants (reference models/BackBoneBertSentence.py
and models/BackBoneAlignFeature.py).

- BackBoneBertSentence: the GloVe/char text path is replaced by ONE sentence
  vector (SBERT 768-d; tmask = ones(B, 1)); a VisualProjection-style affine
  maps 768 -> dim, then the usual dual attention + fusion + match head.
- BackBoneAlignFeature: BackBone plus an alignment head — L1 between the
  masked-max-pooled inner-moment video features (inner mask = NER==2) and
  the sentence embedding (requires model.dim == 768, as the shipped config
  sets).  Loss = loc + L1(vfeatalg, sentence_embedding)
  (BackBoneAlignFeature.py:106-123).
"""

from __future__ import annotations

import random
from typing import Any, Dict, List

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from vmrframe_tpu.data.batcher import Batcher
from vmrframe_tpu.data.sentence_encoder import get_sentence_encoder
from vmrframe_tpu.layers import (
    CQAttention,
    CQConcatenate,
    DualAttentionBlock,
    Embedding,
    FeatureEncoder,
    SeqPANPredictor,
    VisualProjection,
)
from vmrframe_tpu.losses import lossfun_loc, lossfun_match
from vmrframe_tpu.models.common import encode_and_fuse
from vmrframe_tpu.models.seqpan import match_head
from vmrframe_tpu.ops.span import infer_span_1d
from vmrframe_tpu.registry import register_model


class SentenceBatcher(Batcher):
    """Base pipeline + per-sample sentence embeddings."""

    sentence_dim = 768
    single_token_text = False

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.encoder = get_sentence_encoder(self.sentence_dim)

    def make_batch(self, indices: List[int], rng: random.Random) -> Dict[str, np.ndarray]:
        batch = super().make_batch(indices, rng)
        B = self.batch_size
        emb = np.zeros((B, self.sentence_dim), dtype=np.float32)
        for slot, idx in enumerate(indices):
            emb[slot] = self.encoder.encode(self.dataset[idx]["sentence"])
        batch["sentence_embeddings"] = emb
        if self.single_token_text:
            # the reference's collate overrides tmasks with ones(B, 1)
            batch["tmasks_sentence"] = np.ones((B, 1), dtype=np.float32)
        batch["inner_masks"] = (batch["NER_labels"] == 2).astype(np.float32)
        return batch


class BertSentenceBatcher(SentenceBatcher):
    single_token_text = True


class BackBoneBertSentence(nn.Module):
    cfg: Any
    derived: Any
    word_vectors: Any

    @nn.compact
    def __call__(self, batch: Dict[str, jnp.ndarray], deterministic: bool = True):
        m = self.cfg.model
        dim, droprate = m.dim, m.droprate
        vmask = batch["vmasks"]
        tmask = batch["tmasks_sentence"]  # (B, 1)

        tfeat = VisualProjection(dim, droprate, name="text_affine")(
            batch["sentence_embeddings"][:, None, :], deterministic)  # (B, 1, dim)
        tfeat = FeatureEncoder(dim, max_pos_len=m.vlen, kernel_size=7, num_layers=4,
                               droprate=droprate, name="tfeat_encoder")(tfeat, deterministic)
        vfeat = VisualProjection(dim, droprate, name="video_affine")(batch["vfeats"], deterministic)
        vfeat = FeatureEncoder(dim, max_pos_len=m.vlen, kernel_size=7, num_layers=4,
                               droprate=droprate, name="vfeat_encoder")(vfeat, deterministic)

        dab1 = DualAttentionBlock(dim, m.num_heads, droprate, name="dual_attention_block_1")
        dab2 = DualAttentionBlock(dim, m.num_heads, droprate, name="dual_attention_block_2")
        vfeat_ = dab1(vfeat, tfeat, vmask, tmask, deterministic)
        tfeat_ = dab1(tfeat, vfeat, tmask, vmask, deterministic)
        vfeat, tfeat = vfeat_, tfeat_
        vfeat_ = dab2(vfeat, tfeat, vmask, tmask, deterministic)
        tfeat_ = dab2(tfeat, vfeat, tmask, vmask, deterministic)
        vfeat, tfeat = vfeat_, tfeat_

        t2v = CQAttention(dim, droprate, name="q2v_attn")(vfeat, tfeat, vmask, tmask, deterministic)
        v2t = CQAttention(dim, droprate, name="v2q_attn")(tfeat, vfeat, tmask, vmask, deterministic)
        fuse_feat = CQConcatenate(dim, name="cq_cat")(t2v, v2t, tmask)

        fuse_feat, match_score, _, label_embs = match_head(self, fuse_feat, vmask, dim, deterministic)
        slogits, elogits = SeqPANPredictor(dim, m.vlen, num_heads=4, droprate=droprate,
                                           name="predictor")(fuse_feat, vmask, deterministic)
        return {"slogits": slogits, "elogits": elogits, "vmask": vmask,
                "match_score": match_score, "label_embs": label_embs}


def bertsentence_loss(outputs, batch, cfg):
    sample_mask = batch.get("sample_mask")
    label1ds = batch["label1ds"]
    loc = lossfun_loc(outputs["slogits"], outputs["elogits"], label1ds[:, 0, :], label1ds[:, 1, :],
                      batch["vmasks"], sample_mask)
    match = lossfun_match(outputs["match_score"], outputs["label_embs"], batch["NER_labels"],
                          batch["vmasks"], sample_mask)
    return loc + match


def _infer(outputs, batch, cfg):
    return infer_span_1d(outputs["slogits"], outputs["elogits"], outputs["vmask"])


register_model("BackBoneBertSentence", loss_fn=bertsentence_loss, infer_fn=_infer,
               batcher_cls=BertSentenceBatcher)(BackBoneBertSentence)


class BackBoneAlignFeature(nn.Module):
    cfg: Any
    derived: Any
    word_vectors: Any

    @nn.compact
    def __call__(self, batch: Dict[str, jnp.ndarray], deterministic: bool = True):
        m = self.cfg.model
        dim, droprate = m.dim, m.droprate
        vmask, tmask = batch["vmasks"], batch["tmasks"]

        tfeat = Embedding(out_dim=dim, word_dim=m.word_dim, char_dim=m.char_dim,
                          num_chars=self.derived.num_chars, word_vectors=self.word_vectors,
                          droprate=droprate, name="text_encoder")(
            batch["words_ids"], batch["char_ids"], deterministic)
        vfeat = VisualProjection(dim, droprate, name="video_affine")(batch["vfeats"], deterministic)
        vfeat = FeatureEncoder(dim, max_pos_len=m.vlen, kernel_size=7, num_layers=4,
                               droprate=droprate, name="vfeat_encoder")(vfeat, deterministic)
        tfeat = FeatureEncoder(dim, max_pos_len=m.vlen, kernel_size=7, num_layers=4,
                               droprate=droprate, name="tfeat_encoder")(tfeat, deterministic)

        # alignment vectors BEFORE the dual attention (AlignFeature.py:100-103)
        tfeatalg = jnp.max(tfeat, axis=1)
        vfeatalg = jnp.max(vfeat * batch["inner_masks"][..., None], axis=1)

        dab1 = DualAttentionBlock(dim, m.num_heads, droprate, name="dual_attention_block_1")
        dab2 = DualAttentionBlock(dim, m.num_heads, droprate, name="dual_attention_block_2")
        vfeat_ = dab1(vfeat, tfeat, vmask, tmask, deterministic)
        tfeat_ = dab1(tfeat, vfeat, tmask, vmask, deterministic)
        vfeat, tfeat = vfeat_, tfeat_
        vfeat_ = dab2(vfeat, tfeat, vmask, tmask, deterministic)
        tfeat_ = dab2(tfeat, vfeat, tmask, vmask, deterministic)
        vfeat, tfeat = vfeat_, tfeat_

        t2v = CQAttention(dim, droprate, name="q2v_attn")(vfeat, tfeat, vmask, tmask, deterministic)
        v2t = CQAttention(dim, droprate, name="v2q_attn")(tfeat, vfeat, tmask, vmask, deterministic)
        fuse_feat = CQConcatenate(dim, name="cq_cat")(t2v, v2t, tmask)
        slogits, elogits = SeqPANPredictor(dim, m.vlen, num_heads=4, droprate=droprate,
                                           name="predictor")(fuse_feat, vmask, deterministic)
        return {"slogits": slogits, "elogits": elogits, "vmask": vmask,
                "tfeatalg": tfeatalg, "vfeatalg": vfeatalg}


def alignfeature_loss(outputs, batch, cfg):
    sample_mask = batch.get("sample_mask")
    label1ds = batch["label1ds"]
    loc = lossfun_loc(outputs["slogits"], outputs["elogits"], label1ds[:, 0, :], label1ds[:, 1, :],
                      batch["vmasks"], sample_mask)
    per = jnp.mean(jnp.abs(outputs["vfeatalg"] - batch["sentence_embeddings"]), axis=-1)
    if sample_mask is not None:
        alg = jnp.sum(per * sample_mask) / jnp.maximum(jnp.sum(sample_mask), 1.0)
    else:
        alg = jnp.mean(per)
    return loc + alg


register_model("BackBoneAlignFeature", loss_fn=alignfeature_loss, infer_fn=_infer,
               batcher_cls=SentenceBatcher)(BackBoneAlignFeature)
