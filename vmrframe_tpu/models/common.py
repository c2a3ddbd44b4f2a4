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


def _use_fused_stack(m, deterministic: bool) -> bool:
    """Gate for the fused Pallas dual-attention stack (eval only, TPU, D a
    lane multiple, heads divide D).  Default OFF: measured on v5e at Charades
    dims the whole-stack kernel runs 0.66 ms vs XLA's 0.29 — XLA's batched
    matmuls already hit ~60 TFLOP/s effective here and the kernel's many
    small sequential dots per program cannot match it (docs/DESIGN.md,
    round-2 kernel notes).  Opt in with ``model.fused_dual_stack: true``;
    ``"interpret"`` forces the path in Pallas interpret mode (CPU tests)."""
    flag = (m.get("fused_dual_stack", False) if hasattr(m, "get")
            else getattr(m, "fused_dual_stack", False))
    if not deterministic or not bool(flag):
        return False
    D, H = int(m.dim), int(m.num_heads)
    if D % 128 != 0 or H <= 0 or D % H != 0:
        return False
    if flag == "interpret":
        return True
    from vmrframe_tpu.kernels.attention import pallas_supported

    return pallas_supported()


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
        if _use_fused_stack(m, deterministic):
            # eval path: the whole 4-call stack as ONE VMEM-resident Pallas
            # kernel (kernels/dual_stack.py).  Parameter tree is identical to
            # the module path below (DualAttentionBlockParams), so train and
            # eval share checkpoints freely.
            from vmrframe_tpu.layers.attention import DualAttentionBlockParams

            p1 = DualAttentionBlockParams(dim, m.num_heads, droprate,
                                          name="dual_attention_block_1")()
            p2 = DualAttentionBlockParams(dim, m.num_heads, droprate,
                                          name="dual_attention_block_2")()
            from vmrframe_tpu.kernels.dual_stack import dual_attention_stack

            vfeat, tfeat = dual_attention_stack(
                vfeat, tfeat, vmask, tmask, p1, p2, int(m.num_heads),
                interpret=(m.get("fused_dual_stack", False) if hasattr(m, "get")
                           else getattr(m, "fused_dual_stack", False)) == "interpret")
        else:
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
