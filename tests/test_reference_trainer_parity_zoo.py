"""Head-to-head TRAINING trajectories for the rest of the zoo (SeqPAN's is
in test_reference_trainer_parity.py): the reference's real train engines +
build_optimizer_and_scheduler + the main.py step sequence vs our jitted
optax pipeline, from IDENTICAL converted weights on IDENTICAL synthetic
batches.  Per-step losses within tolerance over >=12 steps.

Shims (documented, test-side, applied to BOTH sides where relevant):
- dropout forced off (torch F.dropout -> identity; our apply runs
  deterministic) — no common RNG stream exists across frameworks;
- CPL: fairseq softmax + .cuda() papering via tests/_reference.load_cpl.
"""

from __future__ import annotations

from types import SimpleNamespace

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

try:
    from tests._reference import load as load_ref
    from tests._reference import load_cpl
    from tests.test_reference_cpl_parity import convert_cpl_params
except ImportError:
    from _reference import load as load_ref
    from _reference import load_cpl
    from test_reference_cpl_parity import convert_cpl_params

N_STEPS = 12
LR, WARMUP, CLIP = 8e-4, 0.1, 1.0


def np_(t):
    return t.detach().numpy()


def map_lstm(sd, prefix):
    out = {}
    for name, v in sd.items():
        if name.startswith(prefix + "."):
            leaf = name[len(prefix) + 1:]
            if leaf.startswith(("weight_", "bias_")):
                out[leaf.replace("weight_", "w_").replace("bias_", "b_")] = np_(v)
    return out


def map_linear(sd, prefix):
    return {"kernel": np_(sd[f"{prefix}.weight"]).T, "bias": np_(sd[f"{prefix}.bias"])}


def run_reference_loop(ref_model, engine, batches, cfgs, to_torch):
    ref_utils = load_ref("utils.utils")
    optimizer, scheduler = ref_utils.build_optimizer_and_scheduler(ref_model, cfgs)
    losses = []
    for b in batches:
        loss, _ = engine(ref_model, to_torch(b), cfgs)
        optimizer.zero_grad()
        loss.backward()
        torch.nn.utils.clip_grad_norm_(ref_model.parameters(), CLIP)
        optimizer.step()
        scheduler.step()
        losses.append(float(loss))
    return losses


def run_our_loop(model, variables, loss_fn, batches, cfg):
    from vmrframe_tpu.train.optim import build_optimizer

    params, rest = variables["params"], {k: v for k, v in variables.items()
                                         if k != "params"}
    tx = build_optimizer(cfg, N_STEPS)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, batch):
        def lf(p):
            out = model.apply({"params": p, **rest}, batch, True)
            return loss_fn(out, batch)

        loss, grads = jax.value_and_grad(lf)(params)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state2, loss

    losses = []
    for b in batches:
        jb = {k: jnp.asarray(v) for k, v in b.items()}
        params, opt_state, loss = step(params, opt_state, jb)
        losses.append(float(loss))
    return losses


# ----------------------------------------------------------------- CPL -----

def test_cpl_training_trajectory_matches_reference(monkeypatch):
    """train_engine_CPL (utils/engine.py:8-26) + the reference CPL model
    (models/model.py:74-172) vs our CPL + rec/div losses + optax AdamW."""
    lib, model_mod = load_cpl()
    ref_engine_mod = load_ref("utils.engine")

    # dropout off on both sides (no shared RNG): model.py:138 hard-codes
    # F.dropout(words_feat, 0.1, training); decoder layers use F.dropout too
    ident = lambda x, p=0.0, training=False, inplace=False: x
    monkeypatch.setattr(model_mod.F, "dropout", ident)
    monkeypatch.setattr(lib.F, "dropout", ident)

    B, L, T, dim, vdim, word_dim = 4, 16, 6, 32, 24, 50
    num_words, num_chars = 40, 20
    P = 8  # the reference hard-codes num_props=8 (model.py:79)
    rng = np.random.default_rng(21)
    torch.manual_seed(21)
    wv = rng.standard_normal((num_words - 2, word_dim)).astype(np.float32) * 0.1

    cfgs = SimpleNamespace(
        model=SimpleNamespace(dim=dim, vlen=L, tlen=T, vdim=vdim,
                              word_dim=word_dim, char_dim=100, num_heads=4,
                              droprate=0.0, name="CPL"),
        num_words=num_words, num_chars=num_chars, device="cpu",
        train=SimpleNamespace(lr=LR, num_train_steps=N_STEPS,
                              warmup_proportion=WARMUP, clip_norm=CLIP),
        others=SimpleNamespace(cpl_num_props=P, cpl_div_lambda=0.15,
                               cpl_div_loss_alhpa=1.0),
    )
    ref_model = model_mod.CPL(cfgs, torch.from_numpy(wv)).train()

    batches = []
    for _ in range(N_STEPS):
        word_ids = rng.integers(1, num_words, (B, T))
        n_words = rng.integers(2, T + 1, B)
        word_ids[np.arange(T)[None, :] >= n_words[:, None]] = 0
        vlens = rng.integers(L // 2, L + 1, B)
        batches.append({
            "vfeats": rng.standard_normal((B, L, vdim)).astype(np.float32),
            "vmasks": (np.arange(L)[None, :] < vlens[:, None]).astype(np.float32),
            "words_ids": word_ids.astype(np.int64),
            "tmasks": (word_ids != 0).astype(np.float32),
        })

    def to_torch(b):
        # train_engine_CPL unpacks a 9-tuple; only 6 slots are used
        return (None, torch.from_numpy(b["vfeats"]),
                torch.from_numpy(b["vmasks"]),
                torch.from_numpy(b["words_ids"]),
                torch.zeros((B, T, 4), dtype=torch.long),
                torch.from_numpy(b["tmasks"]),
                torch.zeros(B), torch.zeros(B), torch.zeros(B))

    torch_losses = run_reference_loop(
        ref_model, ref_engine_mod.train_engine_CPL, batches, cfgs, to_torch)

    # ---- ours, from the converted weights
    from vmrframe_tpu.config import Config, Derived
    from vmrframe_tpu.models.cpl import CPL as OurCPL, cpl_loss

    cfg = Config({
        "task": "charades",
        "train": {"epochs": 1, "batch_size": B, "lr": LR,
                  "warmup_proportion": WARMUP, "clip_norm": CLIP},
        "model": {"name": "CPL", "vlen": L, "tlen": T, "vdim": vdim, "dim": dim,
                  "num_heads": 4, "word_dim": word_dim, "char_dim": 100,
                  "droprate": 0.0},
        "others": {"cpl_num_props": P, "cpl_div_lambda": 0.15,
                   "cpl_div_loss_alhpa": 1.0},
    })
    derived = Derived(num_words=num_words, num_chars=num_chars,
                      num_train_steps=N_STEPS, steps_per_epoch=N_STEPS)
    ours = OurCPL(cfg=cfg, derived=derived, word_vectors=wv)
    k = jax.random.PRNGKey(0)
    b0 = {key: jnp.asarray(v) for key, v in batches[0].items()}
    variables = jax.tree_util.tree_map(
        np.asarray, ours.init({"params": k, "dropout": k}, b0, True))
    # convert from the torch init state captured BEFORE its first step
    torch.manual_seed(21)
    ref_fresh = model_mod.CPL(cfgs, torch.from_numpy(wv))
    variables = convert_cpl_params(ref_fresh, variables)

    jax_losses = run_our_loop(ours, variables,
                              lambda out, b: cpl_loss(out, b, cfg), batches, cfg)

    np.testing.assert_allclose(
        jax_losses, torch_losses, rtol=2e-3, atol=2e-3,
        err_msg="per-step CPL training losses diverge from the reference trainer")
    assert torch_losses[-1] < torch_losses[0]


# ----------------------------------------------------------------- BAN -----

def convert_ban_params(ref_model, variables):
    """Reference BANlib BAN state_dict -> our params/constants, in place."""
    sd = ref_model.state_dict()
    p = variables["params"]
    for enc in ("visual_encoder", "query_encoder", "cross_encoder"):
        p[enc]["biLSTM"] = map_lstm(sd, f"{enc}.biLSTM")
    p["query_encoder"]["unk_vec"] = np_(sd["query_encoder.unk_vec"])
    variables["constants"]["query_encoder"]["glove_vec"] = np_(sd["query_encoder.glove_vec"])
    for nm in ("w4C", "w4Q", "w4mlu"):
        p["cqa_att"][nm] = np_(sd[f"cqa_att.{nm}"])
    p["cqa_att"]["bias"] = np_(sd["cqa_att.bias"])
    ba = p["boundary_aware"]
    for s in ("b", "c"):
        ba[f"feature_transform_{s}"] = map_lstm(sd, f"boundary_aware.feature_transform_{s}")
        ba[f"feature_proj_{s}"] = map_linear(sd, f"boundary_aware.feature_proj_{s}.0")
    p["map2d_proj_kernel"] = np_(sd["map2d_proj.0.weight"]).T
    p["map2d_proj_bias"] = np_(sd["map2d_proj.0.bias"])
    p["predictor_hidden"] = map_linear(sd, "predictor.pred.0")
    p["predictor_out"] = map_linear(sd, "predictor.pred.3")
    p["predictor2_hidden"] = map_linear(sd, "predictor2.pred.0")
    p["predictor2_out"] = map_linear(sd, "predictor2.pred.3")
    p["predictor_offset_hidden"] = map_linear(sd, "predictor_offset.0")
    p["predictor_offset_out"] = map_linear(sd, "predictor_offset.3")
    p["contrast_encoder_hidden"] = map_linear(sd, "contrast_encoder.0")
    p["contrast_encoder_out"] = map_linear(sd, "contrast_encoder.2")
    p["contrast_encoder_t_hidden"] = map_linear(sd, "contrast_encoder_t.0")
    p["contrast_encoder_t_out"] = map_linear(sd, "contrast_encoder_t.2")
    p["prop_pe_fc"] = map_linear(sd, "prop_pe.fc")
    i = 0
    while f"prop_interact.gcn_layer.{i}.fc.0.weight" in sd:
        w = np_(sd[f"prop_interact.gcn_layer.{i}.fc.0.weight"])  # (H, 2H, 1, 1)
        p[f"prop_interact_{i}"]["fc"] = {
            "kernel": w[:, :, 0, 0].T, "bias": np_(sd[f"prop_interact.gcn_layer.{i}.fc.0.bias"])}
        i += 1
    return variables


def test_ban_training_trajectory_matches_reference(monkeypatch):
    """train_engine_BAN (models/BAN.py:211-271) + the full BANlib model
    (models/BAN.py:14-134) vs our BAN + 5-term loss + optax AdamW.  Both
    sides consume IDENTICAL batches produced by OUR BANBatcher (whose label
    fields were parity-tested against the reference collate), from identical
    converted weights.  Proposal sampling produces the same SET of cells
    (test_reference_af_ban_parity::test_proposal_selection_vs_reference) and
    every proposal-level loss term is permutation-invariant."""
    ref_ban_mod = load_ref("models.BAN")

    # dropout off on both sides (map2d_proj/predictor heads hard-code
    # nn.Dropout(0.1) even at droprate 0)
    ident = lambda x, p=0.0, training=False, inplace=False: x
    monkeypatch.setattr(torch.nn.functional, "dropout", ident)

    from vmrframe_tpu.config import Derived, load_config
    from vmrframe_tpu.registry import get_model_entry
    from vmrframe_tpu.testing import make_synthetic_data

    cfg = load_config("tests/configs/charades_ban.json")
    cfg = cfg.updated({
        "model.droprate": 0.0, "train.batch_size": 4, "train.lr": LR,
        "train.warmup_proportion": WARMUP, "train.clip_norm": CLIP,
        # the reference's iterated MaxPool1d chain needs max offset < vlen
        # (counts [4,2,2] at vlen 16 reach offset 16 and crash torch)
        "model.pooling_counts": [4, 2, 1],
    })
    dataset, store = make_synthetic_data(cfg, seed=3, n_train=4 * N_STEPS, n_test=4)
    entry = get_model_entry("BAN")
    derived = Derived(num_words=dataset["n_words"], num_chars=dataset["n_chars"],
                      num_train_steps=N_STEPS, steps_per_epoch=N_STEPS)
    batcher = entry.batcher_cls(dataset["train_set"], store, cfg, derived, "train")
    batches = list(batcher.epoch(seed=0, shuffle=False))[:N_STEPS]
    assert len(batches) == N_STEPS

    m = cfg.model
    torch.manual_seed(31)
    cfgs = SimpleNamespace(
        model=SimpleNamespace(
            vlen=m.vlen, tlen=m.tlen, vdim=m.vdim, dim=m.dim,
            lstm_layer=m.lstm_layer, query_embed_dim=m.query_embed_dim,
            word_dim=m.word_dim, fuse_dim=m.fuse_dim,
            pooling_counts=list(m.pooling_counts), sparse_sample=True,
            contrast_dim=m.contrast_dim, droprate=0.0, topk=m.topk,
            neighbor=m.neighbor, negative=m.negative, prop_num=m.prop_num,
            gcn=SimpleNamespace(num_blocks=cfg.gcn.num_blocks,
                                hidden_size=cfg.gcn.hidden_size),
        ),
        loss=SimpleNamespace(**cfg.loss.to_dict()),
        device="cpu",
        train=SimpleNamespace(lr=LR, num_train_steps=N_STEPS,
                              warmup_proportion=WARMUP, clip_norm=CLIP),
    )
    # pad+unk+glove table like our batcher's vocabulary
    wv = dataset["word_vector"]
    pre_emb = np.concatenate([np.zeros((2, wv.shape[1]), np.float32), wv], 0)
    ref_model = ref_ban_mod.BAN(cfgs, pre_train_emb=pre_emb).train()

    def to_torch(b):
        return {
            "vfeats": torch.from_numpy(np.asarray(b["vfeats"])),
            "words_ids": torch.from_numpy(np.asarray(b["words_ids"], dtype=np.int64)),
            "vlens": torch.from_numpy(np.asarray(b["vlens"], dtype=np.int64)),
            "tlens": torch.from_numpy(np.asarray(b["tlens"], dtype=np.int64)),
            "start_end_offset": torch.from_numpy(np.asarray(b["start_end_offset"])),
            "iou2ds": torch.from_numpy(np.asarray(b["iou2ds"])),
            "dist_idxs": torch.from_numpy(np.asarray(b["dist_idxs"])),
            "map2d_contrasts": torch.from_numpy(np.asarray(b["map2d_contrasts"])),
        }

    def engine(model, data, cfgs):
        return ref_ban_mod.train_engine_BAN(model, data, cfgs)

    torch_losses = run_reference_loop(ref_model, engine, batches, cfgs, to_torch)

    # ---- ours, from the converted weights
    from vmrframe_tpu.models.ban import ban_loss

    ours = entry.model_cls(cfg, derived, wv)
    k = jax.random.PRNGKey(0)
    b0 = {key: jnp.asarray(v) for key, v in batches[0].items()}
    variables = jax.tree_util.tree_map(
        np.asarray, ours.init({"params": k, "dropout": k}, b0, True))
    torch.manual_seed(31)
    ref_fresh = ref_ban_mod.BAN(cfgs, pre_train_emb=pre_emb)
    variables = convert_ban_params(ref_fresh, variables)

    jax_losses = run_our_loop(ours, variables,
                              lambda out, b: ban_loss(out, b, cfg), batches, cfg)

    np.testing.assert_allclose(
        jax_losses, torch_losses, rtol=5e-3, atol=5e-3,
        err_msg="per-step BAN training losses diverge from the reference trainer")
    # every step sees a fresh batch, so a 12-step decrease isn't guaranteed
    # for BAN's 5-term objective — assert the trajectory is live, not flat
    assert float(np.std(torch_losses)) > 1e-3


# --------------------------------------------------------- ActionFormer ----

def convert_af_params(ref_net, variables, prior_bias):
    """Reference PtTransformer state_dict -> our ActionFormer params tree."""
    try:
        from tests.test_reference_af_ban_parity import (
            map_chan_ln, map_masked_conv, map_transformer_block)
    except ImportError:
        from test_reference_af_ban_parity import (
            map_chan_ln, map_masked_conv, map_transformer_block)

    sd = {k: v for k, v in ref_net.state_dict().items()}
    p = variables["params"]
    bk = p["backbone"]
    i = 0
    while f"backbone.embd.{i}.conv.weight" in sd:
        bk[f"embd_{i}"] = map_masked_conv(sd, f"backbone.embd.{i}")
        if f"backbone.embd_norm.{i}.weight" in sd:
            bk[f"embd_norm_{i}"] = map_chan_ln(sd, f"backbone.embd_norm.{i}")
        i += 1
    for group in ("stem", "branch"):
        i = 0
        while any(k.startswith(f"backbone.{group}.{i}.") for k in sd):
            bsd = {k[len(f"backbone.{group}.{i}."):]: v for k, v in sd.items()
                   if k.startswith(f"backbone.{group}.{i}.")}
            bk[f"{group}_{i}"] = map_transformer_block(bsd)
            i += 1
    i = 0
    while f"neck.fpn_norms.{i}.weight" in sd:
        p["neck"][f"fpn_norm_{i}"] = map_chan_ln(sd, f"neck.fpn_norms.{i}")
        i += 1
    for ours, theirs, final_name in (("cls_head", "cls_head", "cls_head"),
                                     ("reg_head", "reg_head", "offset_head")):
        i = 0
        while f"{theirs}.head.{i}.conv.weight" in sd:
            p[ours][f"head_{i}"] = map_masked_conv(sd, f"{theirs}.head.{i}")
            if f"{theirs}.norm.{i}.weight" in sd:
                p[ours][f"norm_{i}"] = map_chan_ln(sd, f"{theirs}.norm.{i}")
            i += 1
        p[ours]["final"] = map_masked_conv(sd, f"{theirs}.{final_name}")
    # our cls head ADDS the prior bias as a constant on top of the param
    p["cls_head"]["final"]["conv"]["bias"] = (
        p["cls_head"]["final"]["conv"]["bias"] - prior_bias)
    i = 0
    while f"reg_head.scale.{i}.scale" in sd:
        p[f"scale_{i}"]["scale"] = np_(sd[f"reg_head.scale.{i}.scale"]).reshape(())
        i += 1
    return variables


def test_actionformer_training_trajectory_matches_reference(monkeypatch):
    """train_engine_ActionFormer (models/ActionFormer.py:154-161) + the real
    PtTransformer vs our ActionFormer with train_cfg.engine_loss='reg' (the
    engine steps on reg_loss ONLY — the cls head is never trained in the
    reference; documented pathology).  Droppath off on both sides (no common
    RNG); the EMA loss normalizer state is threaded on both sides."""
    import math
    import sys
    import types

    sys.modules.setdefault("nms_1d_cpu", types.ModuleType("nms_1d_cpu"))
    ref_meta = load_ref("models.ActionFormerlib.meta_archs")
    # inference runs unconditionally inside forward and would hit the absent
    # nms_1d_cpu extension; its output is unused by the train engine
    monkeypatch.setattr(ref_meta.PtTransformer, "inference",
                        lambda self, *a, **k: [])

    from vmrframe_tpu.config import Derived, load_config
    from vmrframe_tpu.models.actionformer import (
        ActionFormer as OurAF, actionformer_init_extras, actionformer_loss)

    cfg = load_config("tests/configs/charades_actionformer.yaml")
    cfg = cfg.updated({
        "actionformer.train_cfg.droppath": 0.0,
        "actionformer.train_cfg.engine_loss": "reg",
        "train.lr": LR, "train.warmup_proportion": WARMUP,
        "train.clip_norm": CLIP,
    })
    af = cfg.actionformer
    B, T, C = 4, int(af.max_seq_len), int(af.input_dim)

    torch.manual_seed(41)
    ref_net = ref_meta.PtTransformer(**af.to_dict()).train()

    rng = np.random.default_rng(41)
    batches = []
    for _ in range(N_STEPS):
        feats = rng.standard_normal((B, T, C)).astype(np.float32)
        s = rng.uniform(0, T * 0.7, B)
        e = s + rng.uniform(2.0, T * 0.3, B)
        batches.append({
            "feats": feats,
            "masks": np.ones((B, T), np.float32),
            "gt_segments": np.stack([s, e], axis=1).astype(np.float32),
            "sample_mask": np.ones((B,), np.float32),
        })

    cfgs = SimpleNamespace(device="cpu",
                           train=SimpleNamespace(lr=LR, num_train_steps=N_STEPS,
                                                 warmup_proportion=WARMUP,
                                                 clip_norm=CLIP))

    def to_torch(b):
        return [
            {"feats": torch.from_numpy(b["feats"][i].T.copy()),
             "segments": torch.from_numpy(b["gt_segments"][i:i + 1].copy()),
             "labels": torch.zeros(1, dtype=torch.long)}
            for i in range(B)
        ]

    def engine(model, video_list, cfgs):
        losses, _ = model(video_list)
        return losses["reg_loss"], None

    torch_losses = run_reference_loop(ref_net, engine, batches, cfgs, to_torch)

    # ---- ours
    derived = Derived(num_words=10, num_chars=10, num_train_steps=N_STEPS,
                      steps_per_epoch=N_STEPS)
    ours = OurAF(cfg=cfg, derived=derived, word_vectors=None)
    k = jax.random.PRNGKey(0)
    b0 = {key: jnp.asarray(v) for key, v in batches[0].items()}
    variables = jax.tree_util.tree_map(
        np.asarray, ours.init({"params": k, "dropout": k, "drop_path": k}, b0, True))
    torch.manual_seed(41)
    ref_fresh = ref_meta.PtTransformer(**af.to_dict())
    prior = -math.log((1 - af.train_cfg.cls_prior_prob) / af.train_cfg.cls_prior_prob)
    variables = convert_af_params(ref_fresh, variables, prior)

    from vmrframe_tpu.train.optim import build_optimizer

    tx = build_optimizer(cfg, N_STEPS)
    params = variables["params"]
    opt_state = tx.init(params)
    extras = actionformer_init_extras(cfg)

    @jax.jit
    def step(params, opt_state, extras, batch):
        def lf(p):
            out = ours.apply({"params": p}, batch, True)
            loss, new_extras = actionformer_loss(out, batch, cfg, extras)
            return loss, new_extras

        (loss, new_extras), grads = jax.value_and_grad(lf, has_aux=True)(params)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state2, \
            jax.lax.stop_gradient(new_extras), loss

    jax_losses = []
    for b in batches:
        jb = {key: jnp.asarray(v) for key, v in b.items()}
        params, opt_state, extras, loss = step(params, opt_state, extras, jb)
        jax_losses.append(float(loss))

    np.testing.assert_allclose(
        jax_losses, torch_losses, rtol=5e-3, atol=5e-3,
        err_msg="per-step ActionFormer training losses diverge from the "
                "reference trainer")
    assert float(np.std(torch_losses)) > 1e-4


# ----------------------------------------------------------------- CCA -----

def test_cca_training_trajectory_matches_reference(monkeypatch, tmp_path):
    """train_engine_CCA (models/CCA.py:482-495) + the real CCA model vs our
    CCA with model.ref_transformer_quirk=true (the reference feeds (B,C,T+A)
    into nn.TransformerEncoderLayer without batch_first and attends ACROSS
    THE BATCH — our production default fixes that; the quirk branch
    reproduces it exactly for this head-to-head).  Dropout off both sides;
    BatchNorm pinned to eval/running-stats on both sides (no train-mode BN:
    the two frameworks would otherwise update running stats identically but
    normalize by batch stats, which is also identical — eval mode just makes
    the comparison independent of that detail)."""
    try:
        from tests._reference import load_cca
    except ImportError:
        from _reference import load_cca

    import pickle

    mod, fake = load_cca()
    ident = lambda x, p=0.0, training=False, inplace=False: x
    monkeypatch.setattr(torch.nn.functional, "dropout", ident)

    N_TRAIN_C, N_COM = 6, 4
    A = N_TRAIN_C + N_COM
    NUM_CLIPS = 22  # d_model = NUM_CLIPS + A must divide nhead=8 -> 32
    E = 16          # embed_size == FEATPOOL.HIDDEN_SIZE (FuseAttention typing)
    VDIM, QDIM = 24, 300
    B = 3
    num_words = 30

    # concept pickles shared by both sides
    rng = np.random.default_rng(55)
    d = tmp_path
    counts = torch.tensor(rng.integers(0, 40, (N_TRAIN_C, N_TRAIN_C)).astype(np.float32))
    concept_dict = {f"t{i}": int(rng.integers(5, 60)) for i in range(N_TRAIN_C)}
    com_weight = rng.integers(0, 2, (N_COM, A)).astype(np.int32)
    paths = {}
    for name, obj in (("adj", counts), ("num", concept_dict), ("com", com_weight),
                      ("inp", fake["attr_emb"]), ("com_emb", fake["com_dict"])):
        with open(d / f"{name}.pkl", "wb") as f:
            pickle.dump(obj, f)
        paths[name] = str(d / f"{name}.pkl")

    wv = rng.standard_normal((num_words - 2, QDIM)).astype(np.float32) * 0.1
    torch.manual_seed(51)
    cca_block = {
        "NUM_CLIPS": NUM_CLIPS,
        "FEATPOOL": {"INPUT_SIZE": VDIM, "HIDDEN_SIZE": E, "KERNEL_SIZE": 2},
        "FEAT2D": {"POOLING_COUNTS": [4, 2]},
        "INTEGRATOR": {"QUERY_HIDDEN_SIZE": 2 * E,
                       "LSTM": {"NUM_LAYERS": 1, "BIDIRECTIONAL": True}},
        "PREDICTOR": {"KERNEL_SIZE": 5, "NUM_STACK_LAYERS": 1},
        "LOSS": {"MIN_IOU": 0.5, "MAX_IOU": 1.0},
    }

    def ns(obj):
        if isinstance(obj, dict):
            return SimpleNamespace(**{k: ns(v) for k, v in obj.items()})
        return obj

    cfgs = SimpleNamespace(
        device="cpu", num_words=num_words, num_chars=10,
        model=SimpleNamespace(word_dim=QDIM, name="CCA"),
        num_attribute=A, input_channel=QDIM, embed_size=E,
        adj_file=paths["adj"], num_path=paths["num"], com_concept=paths["com"],
        norm_func_type="sigmoid",
        MODEL=ns({"CCA": cca_block}),
        INPUT=ns({"NUM_PRE_CLIPS": NUM_CLIPS, "PRE_QUERY_SIZE": QDIM}),
        train=SimpleNamespace(lr=LR, num_train_steps=N_STEPS,
                              warmup_proportion=WARMUP, clip_norm=CLIP),
    )
    ref_model = mod.CCA(cfgs, torch.from_numpy(wv)).train()
    ref_model.simpredictor.bn.eval()  # running stats on both sides

    T = 8
    batches = []
    for _ in range(N_STEPS):
        word_ids = rng.integers(1, num_words, (B, T))
        n_words = rng.integers(2, T + 1, B)
        word_ids[np.arange(T)[None, :] >= n_words[:, None]] = 0
        label2d = rng.random((B, NUM_CLIPS, NUM_CLIPS)).astype(np.float32)
        batches.append({
            "vfeats": rng.standard_normal((B, NUM_CLIPS, VDIM)).astype(np.float32),
            "vmasks": np.ones((B, NUM_CLIPS), np.float32),
            "words_ids": word_ids.astype(np.int64),
            "tmasks": (word_ids != 0).astype(np.float32),
            "label2ds": label2d,
        })

    concept_inputs = mod.concept_input_embs[None].repeat(B, 1, 1).float()

    def to_torch(b):
        return {
            "words_ids": torch.from_numpy(b["words_ids"]),
            "tmasks": torch.from_numpy(b["tmasks"]),
            "vfeats": torch.from_numpy(b["vfeats"]),
            "vmasks": torch.from_numpy(b["vmasks"]),
            "concept_inputs": concept_inputs,
            "label1ds": torch.zeros(B, 2, NUM_CLIPS),
            "label2ds": torch.from_numpy(b["label2ds"]),
        }

    def engine(model, data, cfgs):
        return mod.train_engine_CCA(model, data, cfgs)

    torch_losses = run_reference_loop(ref_model, engine, batches, cfgs, to_torch)

    # ---- ours, quirk branch, converted weights
    from vmrframe_tpu.config import Config, Derived
    from vmrframe_tpu.models.cca import CCA as OurCCA, cca_loss

    cfg = Config({
        "task": "anet",
        "train": {"epochs": 1, "batch_size": B, "lr": LR,
                  "warmup_proportion": WARMUP, "clip_norm": CLIP},
        "model": {"name": "CCA", "vlen": NUM_CLIPS, "tlen": T, "vdim": VDIM,
                  "dim": E, "word_dim": QDIM, "char_dim": 16, "num_heads": 4,
                  "droprate": 0.0, "ref_transformer_quirk": True},
        "MODEL": {"CCA": cca_block},
        "INPUT": {"NUM_PRE_CLIPS": NUM_CLIPS, "PRE_QUERY_SIZE": QDIM},
        "num_attribute": A, "embed_size": E,
        "adj_file": paths["adj"], "num_path": paths["num"],
        "com_concept": paths["com"], "inp_name": paths["inp"],
        "com_emb": paths["com_emb"], "norm_func_type": "sigmoid",
    })
    derived = Derived(num_words=num_words, num_chars=10,
                      num_train_steps=N_STEPS, steps_per_epoch=N_STEPS)
    ours = OurCCA(cfg=cfg, derived=derived, word_vectors=wv)
    k = jax.random.PRNGKey(0)
    b0 = {key: jnp.asarray(v) for key, v in batches[0].items()}
    variables = jax.tree_util.tree_map(
        np.asarray, ours.init({"params": k, "dropout": k}, b0, True))

    torch.manual_seed(51)
    ref_fresh = mod.CCA(cfgs, torch.from_numpy(wv))
    sd = ref_fresh.state_dict()
    p = variables["params"]
    p["C_GCN"]["gc1_weight"] = np_(sd["C_GCN.gc1.weight"])
    p["C_GCN"]["gc2_weight"] = np_(sd["C_GCN.gc2.weight"])
    fp = np_(sd["featpool.conv.weight"])  # (H, IN, 1)
    p["featpool_conv"] = {"kernel": fp[:, :, 0].T, "bias": np_(sd["featpool.conv.bias"])}
    vt = p["V_TransformerLayer"]
    vt["in_proj_weight"] = np_(sd["V_TransformerLayer.self_attn.in_proj_weight"])
    vt["in_proj_bias"] = np_(sd["V_TransformerLayer.self_attn.in_proj_bias"])
    vt["out_proj_kernel"] = np_(sd["V_TransformerLayer.self_attn.out_proj.weight"]).T
    vt["out_proj_bias"] = np_(sd["V_TransformerLayer.self_attn.out_proj.bias"])
    vt["ff1_kernel"] = np_(sd["V_TransformerLayer.linear1.weight"]).T
    vt["ff1_bias"] = np_(sd["V_TransformerLayer.linear1.bias"])
    vt["ff2_kernel"] = np_(sd["V_TransformerLayer.linear2.weight"]).T
    vt["ff2_bias"] = np_(sd["V_TransformerLayer.linear2.bias"])
    vt["ln1_scale"] = np_(sd["V_TransformerLayer.norm1.weight"])
    vt["ln1_bias"] = np_(sd["V_TransformerLayer.norm1.bias"])
    vt["ln2_scale"] = np_(sd["V_TransformerLayer.norm2.weight"])
    vt["ln2_bias"] = np_(sd["V_TransformerLayer.norm2.bias"])
    p["sim_lstm"] = map_lstm(sd, "simpredictor.lstm")
    p["fc_full"] = map_linear(sd, "simpredictor.fc_full")
    sm = p["sim_map"]
    sm["conv"]["kernel"] = np.transpose(np_(sd["simpredictor.conv.weight"]), (2, 3, 1, 0))
    sm["conv"]["bias"] = np_(sd["simpredictor.conv.bias"])
    sm["conv1"]["kernel"] = np.transpose(np_(sd["simpredictor.conv1.weight"]), (2, 3, 1, 0))
    sm["conv1"]["bias"] = np_(sd["simpredictor.conv1.bias"])
    sm["bn"]["scale"] = np_(sd["simpredictor.bn.weight"])
    sm["bn"]["bias"] = np_(sd["simpredictor.bn.bias"])
    variables["batch_stats"]["sim_map"]["bn"]["mean"] = np_(sd["simpredictor.bn.running_mean"])
    variables["batch_stats"]["sim_map"]["bn"]["var"] = np_(sd["simpredictor.bn.running_var"])
    for nm in ("query", "key", "value"):
        p["T_fuse_attn"][nm] = map_linear(sd, f"T_fuse_attn.{nm}")
    p["v_t_param"] = np_(sd["v_t_param"])
    p["unk_vec"] = np_(sd["word_emb.unk_vec"])
    variables["constants"]["glove_vec"] = np_(sd["word_emb.glove_vec"])

    jax_losses = run_our_loop(ours, variables,
                              lambda out, b: cca_loss(out, b, cfg), batches, cfg)

    np.testing.assert_allclose(
        jax_losses, torch_losses, rtol=5e-3, atol=5e-3,
        err_msg="per-step CCA training losses diverge from the reference trainer")
    assert float(np.std(torch_losses)) > 1e-4
