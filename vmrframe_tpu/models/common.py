"""Shared forward-path pieces for the SeqPAN family.

SeqPAN / BaseFast / BackBone all share the same skeleton (reference
models/{SeqPAN,BaseFast,BackBone}.py): text+video embedding, feature
encoders, optional dual attention, CQAttention fusion.  ``encode_and_fuse``
builds that skeleton inside the calling module's compact context so each
model keeps flat, reference-like parameter names.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp

from vmrframe_tpu.layers import (
    CQAttention,
    CQConcatenate,
    DualAttentionBlock,
    Embedding,
    FeatureEncoder,
    VisualProjection,
)


def encode_and_fuse(
    cfg,
    derived,
    word_vectors,
    batch: Dict[str, jnp.ndarray],
    deterministic: bool,
    *,
    shared_encoder: bool,
    encoder_layers: int,
    use_dual_attention: bool,
):
    """Returns (vfeat, tfeat, fuse_feat) on the video grid."""
    m = cfg.model
    dim, droprate = m.dim, m.droprate
    vmask, tmask = batch["vmasks"], batch["tmasks"]

    tfeat = Embedding(
        out_dim=dim,
        word_dim=m.word_dim,
        char_dim=m.char_dim,
        num_chars=derived.num_chars,
        word_vectors=word_vectors,
        droprate=droprate,
        name="text_encoder",
    )(batch["words_ids"], batch["char_ids"], deterministic)
    vfeat = VisualProjection(dim, droprate, name="video_affine")(batch["vfeats"], deterministic)

    # NB: stacking both modalities into one 2B batch for the shared encoder /
    # dual blocks was measured SLOWER (pad-to-Lmax waste + concat copies
    # outweigh the halved launches at these dims) — keep the two-call form.
    v_encoder = FeatureEncoder(dim, max_pos_len=m.vlen, kernel_size=7,
                               num_layers=encoder_layers, droprate=droprate, name="vfeat_encoder")
    vfeat = v_encoder(vfeat, deterministic)
    if shared_encoder:
        tfeat = v_encoder(tfeat, deterministic)
    else:
        tfeat = FeatureEncoder(dim, max_pos_len=m.vlen, kernel_size=7,
                               num_layers=encoder_layers, droprate=droprate,
                               name="tfeat_encoder")(tfeat, deterministic)

    if use_dual_attention:
        dab1 = DualAttentionBlock(dim, m.num_heads, droprate, name="dual_attention_block_1")
        dab2 = DualAttentionBlock(dim, m.num_heads, droprate, name="dual_attention_block_2")
        vfeat_ = dab1(vfeat, tfeat, vmask, tmask, deterministic)
        tfeat_ = dab1(tfeat, vfeat, tmask, vmask, deterministic)
        vfeat, tfeat = vfeat_, tfeat_
        vfeat_ = dab2(vfeat, tfeat, vmask, tmask, deterministic)
        tfeat_ = dab2(tfeat, vfeat, tmask, vmask, deterministic)
        vfeat, tfeat = vfeat_, tfeat_

    t2v_feat = CQAttention(dim, droprate, name="q2v_attn")(vfeat, tfeat, vmask, tmask, deterministic)
    v2t_feat = CQAttention(dim, droprate, name="v2q_attn")(tfeat, vfeat, tmask, vmask, deterministic)
    fuse_feat = CQConcatenate(dim, name="cq_cat")(t2v_feat, v2t_feat, tmask)
    return vfeat, tfeat, fuse_feat
