"""BAN — Boundary-Aware Network with 2D temporal proposal maps
(reference models/BAN.py + models/BANlib/model.py).

Architecture: BiLSTM visual/query encoders -> CQAttention fusion -> cross
BiLSTM -> TemporalDifference boundary/content streams -> 2D proposal map
(boundary-cat + content segment-max) -> coarse tmap predictor -> adaptive
proposal sampling (top-k + neighbors) -> proposal positional encoding ->
AdaptiveGCN interaction -> refine + offset heads.  5-term loss: scaled-IoU
BCE + refine BCE + temporal-difference CE + SmoothL1 offsets + InfoNCE
contrast (train_engine_BAN, models/BAN.py:211-271).

TPU-native redesign (vs the reference's CUDA/python path):

- packed BiLSTMs -> masked lax.scan LSTM (layers/recurrent.py);
- SparseMaxPool's iterated 1D max-pool chain writing diagonals of a
  (B, D, N, N) map (BANlib/model.py:257-290) -> the same diagonal values
  computed as windowed segment-maxes and scattered with static indices;
- SparseBoundaryCat + the 3·D concat projection -> algebraically split into
  three matmuls A_i + B_j + C_ij (never materializing the concat map);
  invalid cells reproduce the reference's relu(bias) exactly;
- the per-sample python NMS proposal sampler (BANlib/model.py:371-435) -> a
  fixed-shape sorted-space loop over the STATIC valid-cell list, vmapped
  over the batch.  When fewer than prop_num cells are selected the fill
  order differs from the reference only in proposal ORDER (a set-equal
  multiset), which no downstream op observes.

NOTE the reference's BAN path cannot actually run as shipped: its collate
reads d['map2d_contrast'] which BaseDataset has commented out
(utils/BaseDataset.py:47), and AdaptiveGCN reads config.model.gcn while the
shipped config puts gcn at top level (config/charades/BAN.json).  We build
the contrast masks in the batcher and accept gcn at either location.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from vmrframe_tpu.layers.dropout import Dropout

from vmrframe_tpu.data.labels import mask2d as build_mask2d
from vmrframe_tpu.layers.recurrent import LSTM, masked_mean
from vmrframe_tpu.ops.windowed import all_windowed_maxes
from vmrframe_tpu.ops.masking import mask_logits
from vmrframe_tpu.registry import register_model


# ---------------------------------------------------------------- layers


class BANQueryEncoder(nn.Module):
    """Frozen-GloVe embedding + BiLSTM + masked-mean sentence vector
    (BANlib/model.py:8-56)."""

    hidden_dim: int
    embed_dim: int
    num_layers: int
    word_vectors: Any

    @nn.compact
    def __call__(self, tokens, lengths):
        unk = self.param("unk_vec", nn.initializers.xavier_uniform(), (1, self.embed_dim))
        glove = self.variable(
            "constants", "glove_vec",
            lambda: jnp.asarray(np.asarray(self.word_vectors, dtype=np.float32)),
        ).value
        # pad row must follow the table's compute dtype: a hardcoded f32 row
        # would promote the whole text branch under a bf16 policy (same bug
        # class as layers/basic.py WordEmbedding — see ops/precision.py)
        pad = jnp.zeros((1, self.embed_dim), dtype=glove.dtype)
        table = jnp.concatenate([pad, unk.astype(glove.dtype), glove], axis=0)
        from vmrframe_tpu.layers.basic import embedding_lookup

        emb = embedding_lookup(table, tokens)
        out = LSTM(self.hidden_dim, self.num_layers, bidirectional=True, name="biLSTM")(emb, lengths)
        return masked_mean(out, lengths), out


class BANVisualEncoder(nn.Module):
    """BiLSTM + masked-mean clip vector (BANlib/model.py:59-85)."""

    hidden_dim: int
    num_layers: int

    @nn.compact
    def __call__(self, x, lengths):
        out = LSTM(self.hidden_dim, self.num_layers, bidirectional=True, name="biLSTM")(x, lengths)
        return masked_mean(out, lengths), out


class BANCQAttention(nn.Module):
    """BAN's CQAttention variant (BANlib/model.py:104-142): the column
    softmax S2 is computed WITHOUT the context mask (a reference quirk we
    keep), plus a learned scalar bias on the trilinear scores."""

    d_model: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, C, Q, q_mask, deterministic: bool = True):
        w4C = self.param("w4C", nn.initializers.xavier_uniform(), (self.d_model, 1))
        w4Q = self.param("w4Q", nn.initializers.xavier_uniform(), (self.d_model, 1))
        w4mlu = self.param("w4mlu", nn.initializers.xavier_uniform(), (1, 1, self.d_model))
        bias = self.param("bias", nn.initializers.zeros, (1,))
        drop = lambda t: Dropout(self.dropout)(t, deterministic=deterministic)
        Cd, Qd = drop(C), drop(Q)
        S = jnp.matmul(Cd, w4C) + jnp.matmul(Qd, w4Q).transpose(0, 2, 1) + jnp.einsum(
            "bld,bmd->blm", Cd * w4mlu, Qd
        )
        from vmrframe_tpu.ops.precision import biased

        S = biased(S, bias)
        S1 = jax.nn.softmax(mask_logits(S, q_mask[:, None, :]), axis=2)
        S2 = jax.nn.softmax(S, axis=1)
        A = jnp.matmul(S1, Q)
        Bt = jnp.matmul(jnp.matmul(S1, S2.transpose(0, 2, 1)), C)
        return jnp.concatenate([C, A, C * A, C * Bt], axis=2)


class MLPBlock(nn.Module):
    """Linear -> ReLU -> Dropout (the reference's many nn.Sequential heads)."""

    out_dim: int
    droprate: float

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        from vmrframe_tpu.layers.basic import torch_linear_init, torch_bias_init_for

        from vmrframe_tpu.ops.precision import biased

        in_dim = x.shape[-1]
        kernel = self.param("kernel", torch_linear_init, (in_dim, self.out_dim))
        b = self.param("bias", torch_bias_init_for(in_dim), (self.out_dim,))
        y = jax.nn.relu(biased(x @ kernel, b))
        return Dropout(self.droprate)(y, deterministic=deterministic)


class Linear(nn.Module):
    out_dim: int

    @nn.compact
    def __call__(self, x):
        from vmrframe_tpu.layers.basic import torch_linear_init, torch_bias_init_for

        from vmrframe_tpu.ops.precision import biased

        in_dim = x.shape[-1]
        kernel = self.param("kernel", torch_linear_init, (in_dim, self.out_dim))
        b = self.param("bias", torch_bias_init_for(in_dim), (self.out_dim,))
        return biased(x @ kernel, b)


class TemporalDifference(nn.Module):
    """Boundary/content streams + squared temporal-difference signal
    (BANlib/model.py:145-217).  The LSTMs run UNMASKED over the padded
    sequence, matching the reference (no packing there)."""

    split_dim: int
    droprate: float
    layer_num: int = 2

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        hb = LSTM(self.split_dim, self.layer_num, bidirectional=True, name="feature_transform_b")(x, None)
        hc = LSTM(self.split_dim, self.layer_num, bidirectional=True, name="feature_transform_c")(x, None)
        hb = MLPBlock(self.split_dim, self.droprate, name="feature_proj_b")(hb, deterministic)
        hc = MLPBlock(self.split_dim, self.droprate, name="feature_proj_c")(hc, deterministic)
        # td: replicate-pad both ends, squared one-step differences
        right = jnp.concatenate([hb[:, 1:], hb[:, -1:]], axis=1) - hb
        left = jnp.concatenate([hb[:, :1], hb[:, :-1]], axis=1) - hb
        td = jnp.sum(jnp.square(right) + jnp.square(left), axis=-1)
        return hb, hc, td


def segment_max_map(x: jnp.ndarray, offsets) -> jnp.ndarray:
    """Dense (B, L, L, D) seg-max map (the non-compact fallback path).

    x: (B, L, D).  For offset o, cell (i, i+o) = max(x[i..i+o]) — the exact
    values the reference's iterated max-pool chain produces
    (BANlib/model.py:257-290), computed via shared sparse-table windowed
    maxima and assembled with ONE static gather
    (ops/windowed.py::cell_segment_max_map — the per-offset scatter chain it
    replaces compiled to a full-map select fusion per offset in train mode,
    the CCA round-5 finding; bit-exact either way).
    """
    from vmrframe_tpu.ops.windowed import cell_segment_max_map

    return cell_segment_max_map(x, [(int(o), 1) for o in offsets])


def _mask_meta(pooling_counts, L) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    m = build_mask2d(L, pooling_counts)
    offsets = []
    stride, offset = 1, 0
    for c in pooling_counts:
        for _ in range(c):
            offset += stride
            if offset < L:
                offsets.append(offset)
        stride *= 2
    ii, jj = np.nonzero(m)
    return m, np.asarray(offsets), ii, jj


def _iou_cells(moments: jnp.ndarray, ref: jnp.ndarray) -> jnp.ndarray:
    """IoU of (K, 2) grid spans vs one (2,) span (BANlib iou, model.py:345-356)."""
    inter = jnp.minimum(moments[:, 1], ref[1]) - jnp.maximum(moments[:, 0], ref[0])
    union = jnp.maximum(moments[:, 1], ref[1]) - jnp.minimum(moments[:, 0], ref[0])
    return jnp.clip(inter, 0.0) / union


def proposal_selection(scores: jnp.ndarray, moments: jnp.ndarray, topk: int,
                       neighbor: int, negative: int, thresh: float) -> jnp.ndarray:
    """Fixed-shape re-expression of proposal_selection_with_negative
    (BANlib/model.py:359-393).  Returns prop_num cell indices into the
    K-cell list (indices into the UNSORTED cell arrays)."""
    K = scores.shape[0]
    order = jnp.argsort(-scores)  # descending
    m_sorted = moments[order]

    def body(carry, _):
        suppressed, select = carry
        i = jnp.argmax(~suppressed)  # first unsuppressed in sorted order
        ious = _iou_cells(m_sorted, m_sorted[i])
        after = jnp.arange(K) > i
        overlap = (ious > thresh) & after
        sel = overlap & (jnp.cumsum(overlap) <= neighbor)
        select = select | sel
        select = select.at[i].set(True)
        suppressed = suppressed | overlap
        suppressed = suppressed.at[i].set(True)
        return (suppressed, select), None

    (suppressed, select), _ = jax.lax.scan(
        body, (jnp.zeros(K, bool), jnp.zeros(K, bool)), None, length=topk
    )
    total = topk * (neighbor + 1)
    count = jnp.sum(select)
    un = ~suppressed
    pos_fill = un & (jnp.cumsum(un) <= jnp.maximum(total - count, 0))
    neg_fill = un & (jnp.cumsum(un[::-1])[::-1] <= negative)
    pos_rank = jnp.arange(K)
    prio = jnp.where(select, pos_rank,
                     jnp.where(pos_fill | neg_fill, K + pos_rank, 2 * K + pos_rank))
    take = jnp.argsort(prio)[: total + negative]
    return order[take]


class AdaptiveGCN(nn.Module):
    """Edge conv on the semantic proposal graph (BANlib/model.py:565-580):
    out_i = max_j relu(W·[x_j − x_i, x_i])."""

    hidden_size: int

    @nn.compact
    def __call__(self, x):  # (B, N, D)
        diff = x[:, None, :, :] - x[:, :, None, :]  # (B, N, N, D): x_j - x_i
        base = jnp.broadcast_to(x[:, :, None, :], diff.shape)  # x_i
        feat = jnp.concatenate([diff, base], axis=-1)
        out = jax.nn.relu(Linear(self.hidden_size, name="fc")(feat))
        return jnp.max(out, axis=2)


# ---------------------------------------------------------------- model


def _gcn_cfg(cfg):
    if "gcn" in cfg.model:
        return cfg.model.gcn
    return cfg.gcn


class BAN(nn.Module):
    cfg: Any
    derived: Any
    word_vectors: Any

    @nn.compact
    def __call__(self, batch: Dict[str, jnp.ndarray], deterministic: bool = True):
        m = self.cfg.model
        L = m.vlen
        fuse = m.fuse_dim
        # derive lengths from masks when driven by a non-BAN batcher (the
        # frozen-teacher path in BaseFast_BAN_PreTrain)
        if "vlens" in batch:
            vlens, tlens = batch["vlens"], batch["tlens"]
        else:
            vlens = jnp.maximum(jnp.sum(batch["vmasks"], axis=1).astype(jnp.int32), 1)
            tlens = jnp.maximum(jnp.sum(batch["tmasks"], axis=1).astype(jnp.int32), 1)
        # mask follows the feature dtype: an f32 mask would promote the
        # CQ-attention chain under the bf16 policy (exact as 0/1 either way)
        tmask = (jnp.arange(batch["words_ids"].shape[1])[None, :]
                 < tlens[:, None]).astype(batch["vfeats"].dtype)

        _, clip_feature = BANVisualEncoder(m.dim, m.lstm_layer, name="visual_encoder")(
            batch["vfeats"], vlens)
        sentence_feature, word_feature = BANQueryEncoder(
            m.dim, m.query_embed_dim, m.lstm_layer, self.word_vectors, name="query_encoder"
        )(batch["words_ids"], tlens)
        cat_feature = BANCQAttention(fuse, name="cqa_att")(clip_feature, word_feature, tmask, deterministic)
        _, fuse_feature = BANVisualEncoder(m.dim, m.lstm_layer, name="cross_encoder")(cat_feature, vlens)

        hidden_b, hidden_c, td = TemporalDifference(
            fuse, m.droprate, layer_num=2, name="boundary_aware")(fuse_feature, deterministic)

        mask_np, offsets, ii, jj = _mask_meta(list(m.pooling_counts), L)
        mask2d = jnp.asarray(mask_np)
        compact = bool(m.get("compact_map", True)) if hasattr(m, "get") \
            else bool(getattr(m, "compact_map", True))

        # boundary-cat + projection, decomposed: proj([b_i, b_j, c_ij]) =
        # b_i@W1 + b_j@W2 + c_ij@W3 + bias  (relu(bias) at invalid cells,
        # exactly like projecting the reference's zero-filled concat map)
        W = self.param("map2d_proj_kernel",
                       lambda k, s: jax.random.uniform(k, s, jnp.float32,
                                                       -1 / math.sqrt(3 * fuse), 1 / math.sqrt(3 * fuse)),
                       (3 * fuse, fuse))
        b = self.param("map2d_proj_bias",
                       lambda k, s: jax.random.uniform(k, s, jnp.float32,
                                                       -1 / math.sqrt(3 * fuse), 1 / math.sqrt(3 * fuse)),
                       (fuse,))
        W1, W2, W3 = W[:fuse], W[fuse : 2 * fuse], W[2 * fuse :]
        A = hidden_b @ W1  # (B, L, F) — start boundary term
        Bt = hidden_b @ W2  # end boundary term
        contrast_dim = m.contrast_dim
        B_ = fuse_feature.shape[0]

        if compact:
            # ---- compact-cells formulation (TPU-native; exactly equivalent)
            # Every consumer of the (B, L, L, F) map is POINTWISE (no spatial
            # convs), so compute only the K valid sparse cells (~33% of L² at
            # the shipped config) plus ONE sentinel "invalid" cell that
            # carries the bias-only value every invalid cell shares — which
            # reproduces the dense path's relu(bias)->predictor constant that
            # ban_infer's full-triu argmax quirk can observe.
            wins = all_windowed_maxes(fuse_feature, [o + 1 for o in offsets])
            # offset-major assembly, then a static permutation into the
            # row-major np.nonzero order (keeps proposal-selection argsort
            # tie-breaking identical to the dense path)
            om_cells = jnp.concatenate(
                [fuse_feature] + [wins[o + 1] for o in offsets], axis=1)  # (B, K, F)
            om_i = np.concatenate([np.arange(L)] + [np.arange(L - o) for o in offsets])
            om_j = np.concatenate([np.arange(L)] + [np.arange(L - o) + o for o in offsets])
            lut = {(int(i_), int(j_)): k for k, (i_, j_) in enumerate(zip(om_i, om_j))}
            perm = np.asarray([lut[(int(i_), int(j_))] for i_, j_ in zip(ii, jj)])
            mapc_cells = om_cells[:, jnp.asarray(perm)]  # (B, K, F) row-major
            K = mapc_cells.shape[1]

            iis, jjs = jnp.asarray(ii), jnp.asarray(jj)
            from vmrframe_tpu.ops.precision import biased

            zc = biased(A[:, iis] + Bt[:, jjs] + mapc_cells @ W3, b)  # (B, K, F)
            zc = jnp.concatenate(
                [zc, jnp.broadcast_to(b.astype(zc.dtype), (B_, 1, fuse))],
                axis=1)  # + sentinel
            map_cells = Dropout(0.1)(jax.nn.relu(zc), deterministic=deterministic)
            tmap_all = Linear(1, name="predictor_out")(
                MLPBlock(fuse, 0.1, name="predictor_hidden")(map_cells, deterministic)
            ).squeeze(-1)  # (B, K+1)
            tmap_cells, t_inv = tmap_all[:, :K], tmap_all[:, K]
            tmap = jnp.broadcast_to(t_inv[:, None, None], (B_, L, L))
            tmap = tmap.at[:, iis, jjs].set(tmap_cells)

            # + a zero-input sentinel: the dense path's invalid cells carry
            # encoder(0) (bias-path constants), observable in raw outputs.
            # The dense (B, L, L, C) map is NOT materialized: ban_loss
            # consumes the cells directly (the contrastive masks live inside
            # mask2d, so invalid cells never contribute), and the sentinel is
            # exported for consumers that scatter a dense view.
            projc_all = Linear(contrast_dim, name="contrast_encoder_out")(
                jax.nn.relu(Linear(contrast_dim, name="contrast_encoder_hidden")(
                    jnp.concatenate([mapc_cells,
                                     jnp.zeros((B_, 1, fuse), mapc_cells.dtype)], axis=1))))
            projc, proj_inv = projc_all[:, :K], projc_all[:, K]
            map2d_proj = None
        else:
            # content stream: segment-max map (only valid cells are nonzero)
            map2d_c = segment_max_map(fuse_feature, list(offsets))
            map2d_c = map2d_c * mask2d[None, :, :, None]
            from vmrframe_tpu.ops.precision import biased

            z = biased(A[:, :, None, :] + Bt[:, None, :, :]
                       + jnp.einsum("bijf,fg->bijg", map2d_c, W3), b)
            z = jnp.where(mask2d[None, :, :, None], z, b.astype(z.dtype))
            map2d = jax.nn.relu(z)
            map2d = Dropout(0.1)(map2d, deterministic=deterministic)

            tmap = Linear(1, name="predictor_out")(
                MLPBlock(fuse, 0.1, name="predictor_hidden")(map2d, deterministic)).squeeze(-1)

            map2d_proj = Linear(contrast_dim, name="contrast_encoder_out")(
                jax.nn.relu(Linear(contrast_dim, name="contrast_encoder_hidden")(map2d_c)))

        sen_proj = Linear(contrast_dim, name="contrast_encoder_t_out")(
            jax.nn.relu(Linear(contrast_dim, name="contrast_encoder_t_hidden")(sentence_feature)))

        # ---- adaptive proposal sampling (static valid-cell list) ----
        cells_i = jnp.asarray(ii)
        cells_j = jnp.asarray(jj)
        moments = jnp.stack([cells_i, cells_j + 1], axis=1).astype(jnp.float32)  # grids[:,1]+=1
        if compact:  # tmap[:, ii, jj] == tmap_cells by construction
            cell_scores = jax.lax.stop_gradient(jax.nn.sigmoid(tmap_cells))
        else:
            score_pred = jax.lax.stop_gradient(jax.nn.sigmoid(tmap))  # masked below
            cell_scores = score_pred[:, cells_i, cells_j]  # (B, K)

        sel_idx = jax.vmap(
            lambda s: proposal_selection(s, moments, topk=m.topk, neighbor=m.neighbor,
                                         negative=m.negative, thresh=0.7)
        )(cell_scores)
        # (B, prop_num) indices into cells
        prop_i = cells_i[sel_idx]  # start index s
        prop_j = cells_j[sel_idx]  # end-1 index (e = j+1)
        bidx = jnp.arange(tmap.shape[0])[:, None]
        if compact:
            prop_feature = jnp.take_along_axis(map_cells[:, :-1], sel_idx[..., None], axis=1)
            pred_score = jnp.take_along_axis(tmap_cells, sel_idx, axis=1)
        else:
            prop_feature = map2d[bidx, prop_i, prop_j]  # (B, P, F)
            pred_score = tmap[bidx, prop_i, prop_j]
        if "start_end_offset" in batch:
            offset_gt = batch["start_end_offset"][bidx, prop_i, prop_j]  # (B, P, 2)
        else:
            offset_gt = jnp.zeros(prop_i.shape + (2,), jnp.float32)
        pred_s_e = jnp.stack([prop_i, prop_j + 1], axis=-1)  # grid spans (s, e)

        # proposal positional encoding (BANlib/model.py:467-498); follows the
        # feature dtype so the PE concat can't promote the proposal branch
        pe = jnp.asarray(_sinusoid_pe(128, m.dim)).astype(prop_feature.dtype)
        pos_s = pe[prop_i]
        pos_e = pe[prop_j]  # pe[e-1]
        prop_feature = Linear(fuse, name="prop_pe_fc")(
            jnp.concatenate([prop_feature, pos_s, pos_e], axis=-1))

        gcn = _gcn_cfg(self.cfg)
        for blk in range(gcn.num_blocks):
            prop_feature = AdaptiveGCN(gcn.hidden_size, name=f"prop_interact_{blk}")(prop_feature)

        pred = Linear(1, name="predictor2_out")(
            MLPBlock(fuse, 0.1, name="predictor2_hidden")(prop_feature, deterministic)).squeeze(-1)
        offset = Linear(2, name="predictor_offset_out")(
            MLPBlock(fuse, 0.1, name="predictor_offset_hidden")(prop_feature, deterministic))

        out = {
            "tmap": tmap,
            "map2d_mask": mask2d,
            "sen_proj": sen_proj,
            "coarse_pred": pred_s_e,
            "final_pred": pred,
            "offset": offset,
            "offset_gt": offset_gt,
            "pred_score": pred_score,
            "td": td,
            "vlens": vlens,
        }
        if compact:
            # cells in mask2d's row-major np.nonzero order; ban_loss consumes
            # these directly (exactly the dense-path loss — the contrastive
            # and BCE masks all live inside mask2d)
            out["tmap_cells"] = tmap_cells
            out["map2d_proj_cells"] = projc
            out["map2d_proj_inv"] = proj_inv  # encoder(0) sentinel (dense view)
        else:
            out["map2d_proj"] = map2d_proj
        return out


def _sinusoid_pe(max_len: int, dim: int) -> np.ndarray:
    pe = np.zeros((max_len, dim), dtype=np.float32)
    position = np.arange(max_len, dtype=np.float32)[:, None]
    div = np.exp(np.arange(0, dim, 2, dtype=np.float32) * (-math.log(10000.0) / dim))
    pe[:, 0::2] = np.sin(position * div)
    pe[:, 1::2] = np.cos(position * div)
    return pe


# ---------------------------------------------------------------- loss


def _smooth_l1(x, y):
    d = jnp.abs(x - y)
    return jnp.where(d < 1.0, 0.5 * d * d, d - 0.5)


def ban_loss(outputs, batch, cfg):
    """5-term BAN objective (train_engine_BAN, models/BAN.py:211-271).

    With the compact map (default) the BCE and contrastive terms consume the
    valid-cell lists the model already computed — every mask in those terms
    lives inside mask2d, so summing over the K cells equals summing over the
    dense (L, L) map exactly (tests/test_ban.py train-mode equivalence)."""
    lw = cfg.loss
    sample_mask = batch["sample_mask"]
    mask2d = outputs["map2d_mask"]  # (L, L) bool
    iou_scaled = jnp.clip((batch["iou2ds"] - lw.min_iou) / (lw.max_iou - lw.min_iou), 0, 1)
    tmap = outputs["tmap"]
    compact_cells = "tmap_cells" in outputs
    if compact_cells:
        L = tmap.shape[-1]
        _, _, ii, jj = _mask_meta(list(cfg.model.pooling_counts), L)
        iis, jjs = jnp.asarray(ii), jnp.asarray(jj)

    # 1. coarse map BCE over valid cells
    if compact_cells:
        tc = outputs["tmap_cells"]  # (B, K)
        iou_c = iou_scaled[:, iis, jjs]
        per_cell = iou_c * jax.nn.softplus(-tc) + (1 - iou_c) * jax.nn.softplus(tc)
        wc2 = jnp.broadcast_to(sample_mask[:, None], per_cell.shape).astype(tc.dtype)
        loss_bce = jnp.sum(per_cell * wc2) / jnp.maximum(jnp.sum(wc2), 1.0)
    else:
        per_cell = iou_scaled * jax.nn.softplus(-tmap) + (1 - iou_scaled) * jax.nn.softplus(tmap)
        w2d = mask2d[None].astype(tmap.dtype) * sample_mask[:, None, None]
        loss_bce = jnp.sum(per_cell * w2d) / jnp.maximum(jnp.sum(w2d), 1.0)

    # 2. refine BCE on sampled proposals vs their scaled IoU
    pred_s_e = outputs["coarse_pred"]
    bidx = jnp.arange(tmap.shape[0])[:, None]
    ious_gt = iou_scaled[bidx, pred_s_e[..., 0], pred_s_e[..., 1] - 1]
    fp = outputs["final_pred"]
    per_prop = ious_gt * jax.nn.softplus(-fp) + (1 - ious_gt) * jax.nn.softplus(fp)
    wp = jnp.broadcast_to(sample_mask[:, None], per_prop.shape)
    loss_refine = jnp.sum(per_prop * wp) / jnp.maximum(jnp.sum(wp), 1.0)

    # 3. temporal-difference loss (BANlib/model.py:672-684)
    td_mask = jnp.sum(batch["dist_idxs"], axis=1)  # (B, L)
    td = jax.nn.softmax(outputs["td"], axis=-1)
    numer = jnp.sum(td_mask * jnp.log(jnp.maximum(td, 1e-30)), axis=-1)
    denom = jnp.sum(td_mask, axis=-1)
    per_sample_td = -numer / (denom + 1e-8)
    loss_td = jnp.sum(per_sample_td * sample_mask) / jnp.maximum(jnp.sum(sample_mask), 1.0)

    # 4. offset SmoothL1
    off_p, off_g = outputs["offset"], outputs["offset_gt"]
    per = _smooth_l1(off_p[..., 0], off_g[..., 0]) + _smooth_l1(off_p[..., 1], off_g[..., 1])
    loss_offset = jnp.sum(per * wp) / jnp.maximum(jnp.sum(wp), 1.0)

    # 5. contrastive InfoNCE over pos/neg cells (BANlib/model.py:639-669)
    def _safe_norm(x, eps=1e-8):
        sq = jnp.sum(x * x, axis=-1, keepdims=True)
        return x / jnp.sqrt(jnp.maximum(sq, eps * eps))

    sen_n = _safe_norm(outputs["sen_proj"])
    tao = 1.0
    if compact_cells:
        # cosine(cells, sen) as two C-contractions — the normalized
        # (B, K, C) tensor never materializes: safe_norm(x)·u ==
        # (x·u)/sqrt(max(Σx², eps²))
        projc = outputs["map2d_proj_cells"]  # (B, K, C)
        num = jnp.einsum("bkc,bc->bk", projc, sen_n)
        den = jnp.sqrt(jnp.maximum(jnp.sum(projc * projc, axis=-1), 1e-16))
        sim = num / den
        pos_m = batch["map2d_contrasts"][:, 0][:, iis, jjs].astype(bool)
        neg_m = batch["map2d_contrasts"][:, 1][:, iis, jjs].astype(bool)
        red_axes = (1,)
    else:
        cells_n = _safe_norm(outputs["map2d_proj"])  # (B, L, L, C)
        sim = jnp.einsum("bijc,bc->bij", cells_n, sen_n)
        pos_m = batch["map2d_contrasts"][:, 0].astype(bool) & mask2d[None]
        neg_m = batch["map2d_contrasts"][:, 1].astype(bool) & mask2d[None]
        red_axes = (1, 2)
    pos_exp = jnp.sum(jnp.where(pos_m, jnp.exp(sim / tao), 0.0), axis=red_axes)
    all_exp = pos_exp + jnp.sum(jnp.where(neg_m, jnp.exp(sim / tao), 0.0), axis=red_axes)
    has_both = (jnp.sum(pos_m, red_axes) > 0) & (jnp.sum(neg_m, red_axes) > 0)
    per_c = -jnp.log(pos_exp / (all_exp + 1e-8) + 1e-30)
    wc = has_both.astype(per_c.dtype) * sample_mask
    loss_contrast = jnp.sum(per_c * wc) / jnp.maximum(jnp.sum(wc), 1.0)

    return (loss_bce * lw.bce + loss_refine * lw.refine + loss_td * lw.td
            + loss_offset * lw.offset + loss_contrast * lw.contrast)


def ban_infer(outputs, batch, cfg):
    """Raw-tmap triu argmax / valid length (reference infer_BAN,
    models/BAN.py:297-307 — no sigmoid, no mask2d; quirks preserved)."""
    tmap = outputs["tmap"]
    L = tmap.shape[-1]
    triu = jnp.triu(jnp.ones((L, L), bool))
    outer = jnp.where(triu[None], tmap, 0.0)
    start_idx = jnp.argmax(jnp.max(outer, axis=2), axis=1)
    end_idx = jnp.argmax(jnp.max(outer, axis=1), axis=1)
    denom = outputs["vlens"].astype(jnp.float32)
    return jnp.stack([start_idx / denom, end_idx / denom], axis=1)


from vmrframe_tpu.data.ban_batcher import BANBatcher  # noqa: E402

# optimizer_impl: round-4 on-chip A/B — tree-chain AdamW 23.5 vs flat 26.8
# ms/step at charades dims (docs/BENCH_ZOO.json)
register_model("BAN", loss_fn=ban_loss, infer_fn=ban_infer, batcher_cls=BANBatcher,
               optimizer_impl="tree")(BAN)
