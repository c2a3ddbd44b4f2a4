"""END-TO-END numerical parity: the full SeqPAN forward vs a functional
torch oracle driven by OUR parameters (the BASELINE.json ≤1e-4 per-layer
fidelity target, checked at the model level).

The oracle is written functionally over the param tree (not as nn.Modules),
mirroring the documented math of every block; gumbel noise is off
(deterministic eval => softmax(logits/τ))."""

import math
import random

import jax
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from vmrframe_tpu.config import Derived
from vmrframe_tpu.data.batcher import Batcher
from vmrframe_tpu.registry import get_model_entry
from vmrframe_tpu.testing import make_synthetic_data


def T(x):
    return torch.tensor(np.asarray(x, dtype=np.float32))


def conv1d(x, p):  # our Conv1D == Dense
    y = x @ T(p["kernel"])
    return y + T(p["bias"]) if "bias" in p else y


def ln(x, p, eps=1e-6):
    mu = x.mean(-1, keepdim=True)
    var = ((x - mu) ** 2).mean(-1, keepdim=True)
    return (x - mu) / torch.sqrt(var + eps) * T(p["scale"]) + T(p["bias"])


def mask_logits(x, m):
    return x + (1.0 - m) * -1e30


def word_embed(ids, p, consts):
    table = torch.cat([torch.zeros(1, T(p["unk_vec"]).shape[1]), T(p["unk_vec"]),
                       T(consts["glove_vec"])], dim=0)
    return table[ids]


def char_embed(ids, p):
    table = T(p["char_table"]).clone()
    emb = table[ids] * (ids != 0).float().unsqueeze(-1)  # padding_idx=0
    B, W, C, D = emb.shape
    emb = emb.reshape(B * W, C, D)
    outs = []
    for k, ch in zip((1, 2, 3, 4), (10, 20, 30, 40)):
        kp = p[f"conv_k{k}"]
        w = T(kp["kernel"])  # (k, D, ch)
        windows = emb.unfold(1, k, 1)  # (BW, C-k+1, D, k)
        y = torch.einsum("nwdk,kdc->nwc", windows, w) + T(kp["bias"])
        outs.append(torch.relu(y).max(dim=1).values)
    return torch.cat(outs, dim=1).reshape(B, W, 100)


def dwconv_block(x, p, n_layers=4, ks=7):
    out = x
    for i in range(n_layers):
        res = out
        h = ln(out, p[f"layer_norm_{i}"])
        w_dw = T(p[f"depthwise_{i}"]["kernel"])  # (ks, 1, D)
        h2 = torch.nn.functional.conv1d(
            h.transpose(1, 2), w_dw.permute(2, 1, 0), padding=ks // 2,
            groups=h.shape[-1]).transpose(1, 2)
        h2 = conv1d(h2, p[f"pointwise_{i}"])
        out = torch.relu(h2) + res
    return out


def feature_encoder(x, p):
    pos = T(p["pos_embedding"]["position_embeddings"])[: x.shape[1]]
    return dwconv_block(x + pos, p["conv_block"])


def mha(q, k, v, mask2d, heads):
    B, Lq, D = q.shape
    hd = D // heads
    sh = lambda t: t.reshape(B, -1, heads, hd).permute(0, 2, 1, 3)
    scores = sh(q) @ sh(k).transpose(-1, -2) / math.sqrt(hd)
    scores = scores + (1.0 - mask2d.unsqueeze(1)) * -1e30
    probs = torch.softmax(scores, dim=-1)
    out = probs @ sh(v)
    return out.permute(0, 2, 1, 3).reshape(B, Lq, D)


def dual_block(from_t, to_t, fmask, tmask, p, heads):
    d = p["dual_multihead_attention"]
    x = ln(from_t, p["layer_norm_1"])
    to_n = ln(to_t, p["layer_norm_t"])
    q = conv1d(x, d["query"])
    fk, fv = conv1d(x, d["f_key"]), conv1d(x, d["f_value"])
    tk, tv = conv1d(to_n, d["t_key"]), conv1d(to_n, d["t_value"])
    smask2d = fmask.unsqueeze(2) @ fmask.unsqueeze(1)
    xmask2d = fmask.unsqueeze(2) @ tmask.unsqueeze(1)
    s_val = conv1d(mha(q, fk, fv, smask2d, heads), d["s_dense"])
    x_val = conv1d(mha(q, tk, tv, xmask2d, heads), d["x_dense"])
    s_gate = conv1d(s_val, d["s_gate"])
    x_gate = conv1d(x_val, d["x_gate"])
    fused = conv1d(s_gate * x_val + x_gate * s_val, d["guided_dense"])

    def bilinear(bp, a, b):
        return conv1d(a, bp["dense_1"]) + conv1d(b, bp["dense_1"]) + T(bp["bias_value"])

    scores = bilinear(d["bilinear_1"], x, fused)
    values = bilinear(d["bilinear_2"], x, fused)
    attn_out = torch.sigmoid(mask_logits(scores, fmask.unsqueeze(2))) * values

    h = conv1d(attn_out, p["dense_1"])
    res = h + from_t
    h2 = conv1d(ln(res, p["layer_norm_2"]), p["dense_2"])
    return h2 + res


def cq_attention(ctx, qry, cmask, qmask, p):
    s0 = ctx @ T(p["w4C"])
    s1 = (qry @ T(p["w4Q"])).transpose(1, 2)
    s2 = (ctx * T(p["w4mlu"])) @ qry.transpose(1, 2)
    score = s0 + s1 + s2
    s_ = torch.softmax(mask_logits(score, qmask.unsqueeze(1)), dim=2)
    s_t = torch.softmax(mask_logits(score, cmask.unsqueeze(2)), dim=1).transpose(1, 2)
    c2q = s_ @ qry
    q2c = (s_ @ s_t) @ ctx
    return conv1d(torch.cat([ctx, c2q, ctx * c2q, ctx * q2c], dim=2), p["cqa_linear"])


def cq_concat(ctx, qry, qmask, p):
    alpha = torch.softmax(mask_logits(qry @ T(p["weighted_pool"]["weight"]),
                                      qmask.unsqueeze(2)), dim=1)
    pooled = (qry.transpose(1, 2) @ alpha).squeeze(2)
    pooled = pooled.unsqueeze(1).expand(-1, ctx.shape[1], -1)
    return conv1d(torch.cat([ctx, pooled], dim=2), p["conv1d"])


def predictor(x, mask, p, heads=4):
    enc = p["feature_encoder"]

    def enc_pass(h):
        feats = dwconv_block(h + T(enc["pos_embedding"]["position_embeddings"])[: h.shape[1]],
                             enc["conv_block"])
        o = ln(feats, enc["layer_norm_1"])
        t = enc["top_self_attention"]
        attn = mha(conv1d(o, t["query"]), conv1d(o, t["key"]), conv1d(o, t["value"]),
                   mask.unsqueeze(2) @ mask.unsqueeze(1), heads)
        attn = conv1d(attn, t["out_proj"])
        res = attn + feats
        return conv1d(ln(res, enc["layer_norm_2"]), enc["dense"]) + res

    s_feat = enc_pass(x)
    e_feat = enc_pass(s_feat)
    s_feat = ln(s_feat, p["start_layer_norm"])
    e_feat = ln(e_feat, p["end_layer_norm"])
    s_h = conv1d(torch.cat([s_feat, x], dim=-1), p["start_hidden"])
    e_h = conv1d(torch.cat([e_feat, x], dim=-1), p["end_hidden"])
    return conv1d(s_h, p["start_dense"]).squeeze(-1), conv1d(e_h, p["end_dense"]).squeeze(-1)


def torch_seqpan_forward(params, consts, batch, heads):
    to_np = lambda tree: jax.tree_util.tree_map(np.asarray, tree)
    p, c = to_np(params), to_np(consts)
    wid = torch.tensor(np.asarray(batch["words_ids"]), dtype=torch.long)
    cid = torch.tensor(np.asarray(batch["char_ids"]), dtype=torch.long)
    vmask, tmask = T(batch["vmasks"]), T(batch["tmasks"])

    te = p["text_encoder"]
    w = word_embed(wid, te["word_emb"], c["text_encoder"]["word_emb"])
    ch = char_embed(cid, te["char_emb"])
    tfeat = ln(conv1d(torch.cat([w, ch], dim=2), te["query_conv1d"]), te["q_layer_norm"])
    va = p["video_affine"]
    vfeat = ln(conv1d(T(batch["vfeats"]), va["video_conv1d"]), va["v_layer_norm"])

    vfeat = feature_encoder(vfeat, p["vfeat_encoder"])
    tfeat = feature_encoder(tfeat, p["vfeat_encoder"])  # shared encoder

    for name in ("dual_attention_block_1", "dual_attention_block_2"):
        v_ = dual_block(vfeat, tfeat, vmask, tmask, p[name], heads)
        t_ = dual_block(tfeat, vfeat, tmask, vmask, p[name], heads)
        vfeat, tfeat = v_, t_

    t2v = cq_attention(vfeat, tfeat, vmask, tmask, p["q2v_attn"])
    v2t = cq_attention(tfeat, vfeat, tmask, vmask, p["v2q_attn"])
    fuse = cq_concat(t2v, v2t, tmask, p["cq_cat"])

    m_logits = conv1d(fuse, p["match_conv1d"])
    m_score = torch.softmax(m_logits / 0.3, dim=-1)  # deterministic eval path
    soft = m_score @ T(p["label_embs"]).T
    fuse = (fuse + soft) * vmask.unsqueeze(2)
    return predictor(fuse, vmask, p["predictor"], heads=4)


def test_seqpan_full_forward_parity(charades_cfg):
    dataset, store = make_synthetic_data(charades_cfg, seed=0, n_train=8, n_test=4)
    derived = Derived(num_words=dataset["n_words"], num_chars=dataset["n_chars"])
    entry = get_model_entry("SeqPAN")
    model = entry.model_cls(cfg=charades_cfg, derived=derived,
                            word_vectors=dataset["word_vector"])
    batch = Batcher(dataset["train_set"], store, charades_cfg, derived, "train").make_batch(
        list(range(8)), random.Random(0))
    example = {k: v for k, v in batch.items() if k != "num_valid"}
    rng = jax.random.PRNGKey(0)
    variables = model.init({"params": rng, "dropout": rng, "gumbel": rng}, example, True)
    ours = model.apply(variables, example, True)

    t_s, t_e = torch_seqpan_forward(variables["params"], variables["constants"], example,
                                    heads=charades_cfg.model.num_heads)
    np.testing.assert_allclose(np.asarray(ours["slogits"]), t_s.numpy(), atol=1e-4,
                               err_msg="start logits diverge from the torch oracle")
    np.testing.assert_allclose(np.asarray(ours["elogits"]), t_e.numpy(), atol=1e-4,
                               err_msg="end logits diverge from the torch oracle")
