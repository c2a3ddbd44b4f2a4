"""CCA — Commonsense-aware Cross-modal Alignment (reference models/CCA.py).

Concept GCN over a commonsense graph -> visual features concatenated with
the concept basis -> transformer layer -> sparse 2D proposal map ->
SimPredictor (LSTM query + conv2d map) -> concept-fused dual v2t/t2v score
maps blended by a learned scalar.  Loss: scaled-IoU BCE over the dense
generate_2dmask cells (CCALoss, models/CCA.py:459-495).

Deviations from the reference, all forced by reference bugs:

- concept pickles are config-injected (data/concepts.py), not loaded from
  hard-coded absolute paths at import time (models/CCA.py:393-397);
- the reference feeds (B, C, T+A) into nn.TransformerEncoderLayer WITHOUT
  batch_first, so torch attends ACROSS THE BATCH (models/CCA.py:337-340);
  we attend per-sample over the channel rows — the intended semantics;
- infer_CCA reads output['logit2D_mask'] which the model never returns
  (models/CCA.py:497-501 would KeyError) and would divide by a (L, L) mask
  row-sum; we run infer_basic2d with the dense 2D mask and the real frame
  mask — the sane protocol, consistent with the other 2D models.

BatchNorm running stats live in the 'batch_stats' collection carried by
TrainState.constants through the jitted step.
"""

from __future__ import annotations

import math
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from vmrframe_tpu.layers.dropout import Dropout

from vmrframe_tpu.data.labels import mask2d as dense_mask2d
from vmrframe_tpu.layers.recurrent import LSTM
from vmrframe_tpu.models.ban import Linear
from vmrframe_tpu.ops.windowed import all_windowed_maxes
from vmrframe_tpu.ops.span import infer_span_2d
from vmrframe_tpu.registry import register_model


def _cca_cfg(cfg):
    return cfg.MODEL.CCA


def l2norm(x, eps=1e-12):
    # safe at exactly-zero vectors (invalid map cells): jnp.linalg.norm has a
    # NaN gradient at 0; clamping inside the sqrt matches torch F.normalize
    sq = jnp.sum(x * x, axis=-1, keepdims=True)
    return x / jnp.sqrt(jnp.maximum(sq, eps * eps))


def cca_strided_mask_meta(pooling_counts, N):
    """CCA's STRIDED sparse map (models/CCA.py:183-204): diagonals thin out
    by the stage stride.  Returns (mask, [(offset, stride)])."""
    mask = np.zeros((N, N), dtype=bool)
    mask[np.arange(N), np.arange(N)] = True
    cells = []
    stride, offset = 1, 0
    for c in pooling_counts:
        for _ in range(c):
            offset += stride
            if offset >= N:
                break
            i = np.arange(0, N - offset, stride)
            mask[i, i + offset] = True
            cells.append((offset, stride))
        stride *= 2
    return mask, cells


def strided_segment_max_map(x: jnp.ndarray, cells, impl: str = "gather") -> jnp.ndarray:
    """(B, L, D) -> (B, L, L, D) with cell (i, i+o) = max(x[i..i+o]) for the
    strided diagonal set.

    impl "gather" (default): ops/windowed.py::cell_segment_max_map — one
    static gather over stacked window maxima, custom-VJP gather backward.
    Bit-exact vs "scatter" (the original per-offset ``.at[].set`` chain,
    kept measurable: in train mode every scatter became its own full-map
    select fusion — ~26 ms of CCA's 57 ms step, docs/TRACE_CCA_TRAIN.json /
    docs/ROOFLINE_TRACE_TRAIN.json).  Round-5 same-session on-chip A/B
    (BENCH_ZOO CCA vs CCA_scattermap, measured_round 5): train 22.83 vs
    56.28 ms/step (2.5x), HBM 3.94 vs 20.95 GB/step; eval unchanged."""
    if impl == "gather":
        from vmrframe_tpu.ops.windowed import cell_segment_max_map

        return cell_segment_max_map(x, cells)
    B, L, D = x.shape
    out = jnp.zeros((B, L, L, D), x.dtype)
    out = out.at[:, jnp.arange(L), jnp.arange(L), :].set(x)
    wins = all_windowed_maxes(x, [o + 1 for o, _ in cells])
    for o, s in cells:
        i = jnp.arange(0, L - o, s)
        out = out.at[:, i, i + o, :].set(wins[o + 1][:, i])
    return out


_COS_EPS2 = 1e-24  # (1e-12)^2 — l2norm's clamp, squared


@jax.custom_vjp
def cosine_sum_scores(q: jnp.ndarray, m: jnp.ndarray) -> jnp.ndarray:
    """sum_h l2norm(q * m)_h == (sum_h q_h m_h) / sqrt(max(sum_h q_h^2 m_h^2, eps^2)).

    The reference's normalize-then-sum cosine (models/CCA.py:366-374) as a
    custom-VJP op: the forward is the contraction form (the (B, L, L, H)
    product never materializes — the round-4 eval win), and the backward is
    the hand-derived fused form

        dm = (g/den) q - (g num/den^3) q^2 m        (one map-sized pass)
        dq = <g/den, m> - q <g num/den^3, m^2>      (two H-contractions)

    instead of autodiff's bij,bh->bijh outer-product re-materialization of
    the map (the round-4 1.5x train regression, docs/ROADMAP.md) or the
    product form's map-sized residual chain.  q: (B, H), m: (B, L, L, H).
    """
    num = jnp.einsum("bh,bijh->bij", q, m)
    den = jnp.sqrt(jnp.maximum(
        jnp.einsum("bh,bijh->bij", jnp.square(q), jnp.square(m)), _COS_EPS2))
    return num / den


def _css_fwd(q, m):
    num = jnp.einsum("bh,bijh->bij", q, m)
    d2 = jnp.einsum("bh,bijh->bij", jnp.square(q), jnp.square(m))
    den = jnp.sqrt(jnp.maximum(d2, _COS_EPS2))
    return num / den, (q, m, num, den, d2)


def _css_bwd(res, g):
    q, m, num, den, d2 = res
    a = g / den
    # max(d2, eps^2) passes gradient only where d2 > eps^2 (all-zero map
    # cells sit in the clamped branch: den is constant there)
    b = jnp.where(d2 > _COS_EPS2, g * num / (den * den * den), 0.0)
    q2 = jnp.square(q)
    dm = a[..., None] * q[:, None, None, :] - b[..., None] * q2[:, None, None, :] * m
    dq = (jnp.einsum("bij,bijh->bh", a, m)
          - q * jnp.einsum("bij,bijh,bijh->bh", b, m, m))
    return dq, dm


cosine_sum_scores.defvjp(_css_fwd, _css_bwd)


class ConceptGCN(nn.Module):
    """C_GCN (models/CCA.py:107-152): two shared-adjacency GCN layers +
    LeakyReLU + l2norm.  The normalized adjacency is a frozen constant (the
    reference detaches it)."""

    embed_size: int
    adj: Any  # (A, A) numpy, already D^-1/2-normalized
    concept_embs: Any  # (A, word_dim) numpy

    @nn.compact
    def __call__(self):
        adj = self.variable("constants", "adj_all", lambda: jnp.asarray(self.adj)).value
        inp = self.variable("constants", "concept_embs", lambda: jnp.asarray(self.concept_embs)).value
        half = self.embed_size // 2

        def gcn_init(fan_out):
            stdv = 1.0 / math.sqrt(fan_out)
            return lambda k, s: jax.random.uniform(k, s, jnp.float32, -stdv, stdv)

        w1 = self.param("gc1_weight", gcn_init(half), (inp.shape[-1], half))
        w2 = self.param("gc2_weight", gcn_init(self.embed_size), (half, self.embed_size))
        x = adj @ (inp @ w1)
        x = jax.nn.leaky_relu(x, 0.2)
        x = adj @ (x @ w2)
        return l2norm(x)


class FuseAttention(nn.Module):
    """Concept fusion attention (models/CCA.py:299-329): single-head
    attention of the query vector over the concept basis, temperature ×10,
    dropout 0.5, residual + l2norm."""

    hidden_dim: int
    concept_dim: int

    @nn.compact
    def __call__(self, feat, concept, deterministic: bool = True):
        q = Linear(self.concept_dim, name="query")(feat)  # (B, C)
        k = Linear(self.hidden_dim, name="key")(concept)  # (A, C)
        v = Linear(self.hidden_dim, name="value")(concept)
        scores = jax.nn.softmax(jnp.matmul(q, k.T) * 10.0, axis=1)
        scores = Dropout(0.5)(scores, deterministic=deterministic)
        out = jnp.matmul(scores, v)
        return l2norm(out + feat)


class TransformerLayer(nn.Module):
    """Per-sample post-norm transformer encoder layer (the intended
    semantics of the reference's nn.TransformerEncoderLayer call,
    models/CCA.py:337-340): d_model over the last axis, sequence = the
    channel rows, 8 heads, FFN 2048, dropout 0.1, relu."""

    d_model: int
    nhead: int = 8
    dim_feedforward: int = 2048
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        B, S, D = x.shape
        drop = lambda t: Dropout(self.dropout)(t, deterministic=deterministic)
        h = D // self.nhead
        q = Linear(D, name="q")(x).reshape(B, S, self.nhead, h).transpose(0, 2, 1, 3)
        k = Linear(D, name="k")(x).reshape(B, S, self.nhead, h).transpose(0, 2, 1, 3)
        v = Linear(D, name="v")(x).reshape(B, S, self.nhead, h).transpose(0, 2, 1, 3)
        att = jax.nn.softmax(jnp.einsum("bhsd,bhtd->bhst", q, k) / math.sqrt(h), axis=-1)
        att = drop(att)
        out = jnp.einsum("bhst,bhtd->bhsd", att, v).transpose(0, 2, 1, 3).reshape(B, S, D)
        out = Linear(D, name="out_proj")(out)
        x = _layer_norm(x + drop(out), self.param("ln1_scale", nn.initializers.ones, (D,)),
                        self.param("ln1_bias", nn.initializers.zeros, (D,)))
        ff = Linear(D, name="ff2")(drop(jax.nn.relu(Linear(self.dim_feedforward, name="ff1")(x))))
        return _layer_norm(x + drop(ff), self.param("ln2_scale", nn.initializers.ones, (D,)),
                           self.param("ln2_bias", nn.initializers.zeros, (D,)))


def _layer_norm(x, scale, bias, eps=1e-5):
    mu = jnp.mean(x, -1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), -1, keepdims=True)
    out = (x - mu) * jax.lax.rsqrt(var + eps) * scale + bias
    # vector-param policy (ops/precision.py): cast back to activation dtype
    return out.astype(x.dtype) if out.dtype != x.dtype else out


class RefBatchTransformerLayer(nn.Module):
    """QUIRK-EXACT re-expression of the reference's V_TransformerLayer call
    (models/CCA.py:337-340): the (B, C, T+A) tensor goes into
    nn.TransformerEncoderLayer WITHOUT batch_first, so torch attends ACROSS
    THE BATCH — sequence = the B samples, batch = the C channel rows,
    d_model = T+A.  Default OFF (``model.ref_transformer_quirk``): the
    per-sample TransformerLayer above is the intended semantics.  This
    branch exists so training trajectories can be pinned against the real
    reference (tests/test_reference_trainer_parity_zoo.py).  Parameter
    layout mirrors torch for direct checkpoint conversion."""

    d_model: int
    nhead: int = 8
    dim_feedforward: int = 2048
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        B, C, E = x.shape
        H, hd = self.nhead, E // self.nhead
        drop = lambda t: Dropout(self.dropout)(t, deterministic=deterministic)
        w = self.param("in_proj_weight", nn.initializers.xavier_uniform(), (3 * E, E))
        b = self.param("in_proj_bias", nn.initializers.zeros, (3 * E,))
        q = (x @ w[:E].T + b[:E]) * (hd ** -0.5)
        k = x @ w[E:2 * E].T + b[E:2 * E]
        v = x @ w[2 * E:].T + b[2 * E:]
        q = q.reshape(B, C, H, hd)
        k = k.reshape(B, C, H, hd)
        v = v.reshape(B, C, H, hd)
        att = jax.nn.softmax(jnp.einsum("ichd,jchd->chij", q, k), axis=-1)
        att = drop(att)
        out = jnp.einsum("chij,jchd->ichd", att, v).reshape(B, C, E)
        ow = self.param("out_proj_kernel", nn.initializers.xavier_uniform(), (E, E))
        ob = self.param("out_proj_bias", nn.initializers.zeros, (E,))
        x = _layer_norm(x + drop(out @ ow + ob),
                        self.param("ln1_scale", nn.initializers.ones, (E,)),
                        self.param("ln1_bias", nn.initializers.zeros, (E,)))
        w1 = self.param("ff1_kernel", nn.initializers.xavier_uniform(), (E, self.dim_feedforward))
        b1 = self.param("ff1_bias", nn.initializers.zeros, (self.dim_feedforward,))
        w2 = self.param("ff2_kernel", nn.initializers.xavier_uniform(), (self.dim_feedforward, E))
        b2 = self.param("ff2_bias", nn.initializers.zeros, (E,))
        ff = drop(jax.nn.relu(x @ w1 + b1)) @ w2 + b2
        return _layer_norm(x + drop(ff),
                           self.param("ln2_scale", nn.initializers.ones, (E,)),
                           self.param("ln2_bias", nn.initializers.zeros, (E,)))


class BatchNorm2dTanhConv(nn.Module):
    """conv5x5 -> tanh(BatchNorm) -> conv3x3 over (B, L, L, C) maps
    (SimPredictor's map branch, models/CCA.py:253-258)."""

    features: int

    @nn.compact
    def __call__(self, map2d, deterministic: bool = True):
        from vmrframe_tpu.layers.basic import torch_linear_init_conv

        y = nn.Conv(self.features, (5, 5), padding="SAME",
                    kernel_init=torch_linear_init_conv(map2d.shape[-1] * 25),
                    dtype=map2d.dtype, name="conv")(map2d)
        y = nn.BatchNorm(use_running_average=deterministic, momentum=0.9, epsilon=1e-5,
                         name="bn")(y)
        # BN stats/affine are f32 vector params (ops/precision.py): normalize
        # runs f32 inside the fusion, result returns to the activation dtype
        y = jnp.tanh(y).astype(map2d.dtype)
        return nn.Conv(self.features, (3, 3), padding="SAME", dtype=y.dtype,
                       kernel_init=torch_linear_init_conv(self.features * 9),
                       name="conv1")(y)


class CCA(nn.Module):
    cfg: Any
    derived: Any
    word_vectors: Any

    @nn.compact
    def __call__(self, batch: Dict[str, jnp.ndarray], deterministic: bool = True):
        cfg = self.cfg
        mc = _cca_cfg(cfg)
        L = mc.NUM_CLIPS
        hidden = mc.FEATPOOL.HIDDEN_SIZE
        embed_size = cfg.embed_size

        from vmrframe_tpu.data.concepts import load_concepts

        concept_embs, adj = load_concepts(cfg, word_dim=cfg.INPUT.PRE_QUERY_SIZE)
        concept_basis = ConceptGCN(embed_size, adj, concept_embs, name="C_GCN")()  # (A, E)

        # featpool: 1x1 conv + relu (pool disabled in the reference)
        feats = jax.nn.relu(Linear(hidden, name="featpool_conv")(batch["vfeats"]))  # (B, T, H)
        # concat concept basis along the TIME axis of the (B, H, T) view:
        # rows = hidden channels, columns = T + A "tokens"
        feats = feats.transpose(0, 2, 1)  # (B, H, T)
        A = concept_basis.shape[0]
        cb = jnp.broadcast_to(concept_basis.T[None], (feats.shape[0], embed_size, A))
        x = jnp.concatenate([feats, cb], axis=2)  # (B, H, T+A)
        if bool(cfg.model.get("ref_transformer_quirk", False)):
            x = RefBatchTransformerLayer(L + A, name="V_TransformerLayer")(x, deterministic)
        else:
            x = TransformerLayer(L + A, name="V_TransformerLayer")(x, deterministic)
        feats = x[:, :, :L].transpose(0, 2, 1)  # (B, L, H)

        _, cells = cca_strided_mask_meta(list(mc.FEAT2D.POOLING_COUNTS), L)
        map_impl = str(self.cfg.others.get("cca_map_impl", "gather")) \
            if "others" in self.cfg else "gather"
        map2d = strided_segment_max_map(feats, cells, impl=map_impl)  # (B, L, L, H)

        # ---- SimPredictor (models/CCA.py:230-259) ----
        unk = self.param("unk_vec", nn.initializers.xavier_uniform(), (1, cfg.model.word_dim))
        glove = self.variable(
            "constants", "glove_vec",
            lambda: jnp.asarray(np.asarray(self.word_vectors, dtype=np.float32)),
        ).value
        # pad row follows the table's compute dtype (see ops/precision.py)
        pad = jnp.zeros((1, cfg.model.word_dim), glove.dtype)
        table = jnp.concatenate([pad, unk.astype(glove.dtype), glove], axis=0)
        from vmrframe_tpu.layers.basic import embedding_lookup

        tfeat = embedding_lookup(table, batch["words_ids"])

        qh = mc.INTEGRATOR.QUERY_HIDDEN_SIZE // 2  # bidirectional halves
        q_out = LSTM(qh, mc.INTEGRATOR.LSTM.NUM_LAYERS, bidirectional=True,
                     name="sim_lstm")(tfeat, None)
        wordlens = jnp.sum(batch["tmasks"], axis=1).astype(jnp.int32)
        q_start = q_out[:, 0]
        q_end = jnp.take_along_axis(
            q_out, (wordlens - 1)[:, None, None].clip(0), axis=1).squeeze(1)
        queries = Linear(hidden, name="fc_full")((q_start + q_end) / 2)  # (B, H)

        map2d_fused = BatchNorm2dTanhConv(hidden, name="sim_map")(map2d, deterministic)

        queries_fused = FuseAttention(hidden, embed_size, name="T_fuse_attn")(
            queries, concept_basis, deterministic)

        v_t = self.param("v_t_param", nn.initializers.constant(0.5), (1,))

        # Two EXACT formulations of the reference's normalize-then-sum cosine
        # (models/CCA.py:366-374): sum_h l2norm(q*m) ==
        # (sum_h q*m) / sqrt(max(sum_h q^2*m^2, eps^2)).
        # "contraction": two H-contraction einsums — the (B, L, L, H) product
        #   never materializes in the FORWARD, which wins eval (6.4 -> 6.15
        #   ms/step on-chip); but its BACKWARD re-materializes the map via
        #   bij,bh->bijh outer products and measured a 1.5x TRAIN regression
        #   (63.9 -> 99.6 ms/step, caught by the round-4 zoo re-measure after
        #   commit 89fe514 landed with only a CPU A/B).
        # "product": the broadcast q*m + l2norm chain XLA fuses into the map
        #   producer — the formulation the r3 63.9 ms train row measured.
        # others.cca_contraction_scores: "vjp" (default — cosine_sum_scores,
        # the custom-VJP op above, in BOTH modes: contraction forward + the
        # fused hand-derived backward), "eval" (contraction forward in
        # deterministic mode only, product form in training — the round-4
        # default before the custom VJP existed), "always", or "never".
        # Round-5 same-session on-chip A/B under the gather map (BENCH_ZOO
        # rows CCA vs CCA_legacyscores, measured_round 5): a timing TIE
        # across two runs (vjp 22.83/22.70 vs product 22.55/22.96 ms/step) —
        # vjp stays default for its lower step traffic (3.94 vs 4.35 GB) and
        # for being mode-uniform (no train/eval formulation split).
        mode = str(self.cfg.others.get("cca_contraction_scores", "vjp")) \
            if "others" in self.cfg else "vjp"
        use_contraction = (mode == "always") or (mode == "eval" and deterministic)
        eps = 1e-12

        def scores(q, m):
            if mode == "vjp":
                return cosine_sum_scores(q, m)
            if use_contraction:
                num = jnp.einsum("bh,bijh->bij", q, m)
                den = jnp.sqrt(jnp.maximum(
                    jnp.einsum("bh,bijh->bij", jnp.square(q), jnp.square(m)),
                    eps * eps))
                return num / den
            prod = q[:, None, None, :] * m  # (B, L, L, H)
            return jnp.sum(l2norm(prod), axis=-1)

        v2t = scores(queries, map2d_fused)
        t2v = scores(queries_fused, map2d)
        scores2d = v_t * v2t + (1 - v_t) * t2v
        return {"scores2d": scores2d, "vmask": batch["vmasks"]}


def cca_loss(outputs, batch, cfg):
    """Scaled-IoU BCE over the dense generate_2dmask cells (CCALoss)."""
    from vmrframe_tpu.losses import lossfun_loc2d

    mc = _cca_cfg(cfg)
    mask = jnp.asarray(dense_mask2d(mc.NUM_CLIPS))
    return lossfun_loc2d(outputs["scores2d"], batch["label2ds"], mask,
                         mc.LOSS.MIN_IOU, mc.LOSS.MAX_IOU,
                         sample_mask=batch.get("sample_mask"))


def cca_infer(outputs, batch, cfg):
    mc = _cca_cfg(cfg)
    mask = jnp.asarray(dense_mask2d(mc.NUM_CLIPS))
    return infer_span_2d(outputs["scores2d"], mask, outputs["vmask"])


from vmrframe_tpu.data.cca_batcher import CCABatcher  # noqa: E402

# optimizer_impl: round-4 same-session on-chip A/B — tree-chain AdamW 57.1
# vs flat 62.7 ms/step at anet dims (docs/BENCH_ZOO.json CCA vs CCA_flatopt)
register_model("CCA", loss_fn=cca_loss, infer_fn=cca_infer, batcher_cls=CCABatcher,
               optimizer_impl="tree")(CCA)
