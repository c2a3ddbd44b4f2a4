"""LONG-horizon training-trajectory parity with eval-in-train metrics.

The 12-step suites (test_reference_trainer_parity*.py) prove the step math;
this extends the head-to-head to ~200 optimizer steps — mirroring the
reference's epoch loop semantics (main.py:80-135: train N batches, then a
full test pass, R1@{.3,.5,.7}+mIoU) — for SeqPAN and one 2D-map model (BAN).
At every epoch boundary BOTH sides run their own full eval pipeline
(reference: utils/engine.py infer_basic / models/BAN.py infer_BAN +
models/loss.py append_ious/get_i345_mi; ours: ops/span.py + metrics.py) on
the same held-out split, and the metric TRAJECTORIES must agree:

  - R1@{.3,.5,.7} within one held-out sample's quantum at every epoch;
  - mIoU within 1.0 points at every epoch;
  - per-epoch training losses within 2%.

Float drift over hundreds of f32 steps is real (different reduction orders),
so exact-loss equality is not the bar — metric-level agreement is, because
that is what the reference itself checkpoints on (best test mIoU,
utils/utils.py:208-215).
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
    from tests.test_reference_modules_parity import _fix_top_self_attention2, cfg_ns
    from tests.test_reference_trainer_parity import make_batches
    from tests.test_reference_trainer_parity_zoo import (
        convert_ban_params, run_reference_loop)
except ImportError:
    from _reference import load as load_ref
    from test_reference_modules_parity import _fix_top_self_attention2, cfg_ns
    from test_reference_trainer_parity import make_batches
    from test_reference_trainer_parity_zoo import convert_ban_params, run_reference_loop

from vmrframe_tpu.tools.convert_torch import convert_seqpan_family

LR, WARMUP, CLIP = 8e-4, 0.1, 1.0


def _gt_fracs(b):
    vlens = np.asarray(b["vmasks"]).sum(-1)
    s = np.argmax(np.asarray(b["label1ds"])[:, 0], -1) / np.maximum(vlens - 1, 1)
    e = np.argmax(np.asarray(b["label1ds"])[:, 1], -1) / np.maximum(vlens - 1, 1)
    return np.stack([s, e], -1)


def _assert_metric_trajectories(ref_traj, our_traj, n_eval_samples, what):
    ref_traj = np.asarray(ref_traj, np.float64)  # (epochs, 5): r1i3,r1i5,r1i5,r1i7,mi
    our_traj = np.asarray(our_traj, np.float64)
    quantum = 100.0 / n_eval_samples + 1e-9
    r1_diff = np.abs(ref_traj[:, :4] - our_traj[:, :4]).max()
    mi_diff = np.abs(ref_traj[:, 4] - our_traj[:, 4]).max()
    assert r1_diff <= quantum, (
        f"{what}: R1 metric trajectories diverge by {r1_diff:.3f} "
        f"(> one-sample quantum {quantum:.3f})\nref={ref_traj}\nours={our_traj}")
    assert mi_diff <= 1.0, (
        f"{what}: mIoU trajectories diverge by {mi_diff:.3f} points"
        f"\nref={ref_traj[:, 4]}\nours={our_traj[:, 4]}")


# --------------------------------------------------------------- SeqPAN ----

N_EPOCHS_SP, STEPS_PER_EPOCH_SP = 10, 20  # 200 steps
B, LV, LT, CC = 8, 16, 8, 12
DIM, VDIM, WORD_DIM, CHAR_DIM = 32, 24, 50, 100
N_WORDS, N_CHARS = 40, 20


def test_seqpan_long_trajectory_with_eval_metrics(monkeypatch):
    ref_layers = load_ref("models.layers")
    ref_seqpan = load_ref("models.SeqPAN")
    ref_utils = load_ref("utils.utils")
    ref_engine = load_ref("utils.engine")
    ref_loss = load_ref("models.loss")

    monkeypatch.setattr(ref_layers.TopSelfAttention2, "forward",
                        _fix_top_self_attention2(ref_layers))
    monkeypatch.setattr(ref_seqpan.F, "gumbel_softmax",
                        lambda logits, tau=1.0, hard=False: torch.softmax(logits / tau, dim=-1))

    n_steps = N_EPOCHS_SP * STEPS_PER_EPOCH_SP
    rng = np.random.default_rng(17)
    torch.manual_seed(17)
    wv = rng.normal(size=(N_WORDS, WORD_DIM)).astype(np.float32)
    cfgs = cfg_ns(dim=DIM, vlen=LV, tlen=LT, vdim=VDIM, word_dim=WORD_DIM,
                  char_dim=CHAR_DIM, droprate=0.0, num_words=N_WORDS, num_chars=N_CHARS)
    cfgs.train = SimpleNamespace(lr=LR, num_train_steps=n_steps,
                                 warmup_proportion=WARMUP, clip_norm=CLIP)

    ref = ref_seqpan.SeqPAN(cfgs, wv).train()
    with torch.no_grad():  # off the 0/0-subgradient orthogonal init (see 12-step test)
        ref.label_embs.add_(0.05 * torch.randn_like(ref.label_embs))
    tree = convert_seqpan_family(ref.state_dict())

    train_batches = make_batches(rng, STEPS_PER_EPOCH_SP)  # cycled per epoch
    eval_batches = make_batches(rng, 4)                    # held-out, 32 samples
    gts = [_gt_fracs(b) for b in eval_batches]

    def to_torch(b):
        return {"words_ids": torch.tensor(b["words_ids"]),
                "char_ids": torch.tensor(b["char_ids"]),
                "vfeats": torch.tensor(b["vfeats"]),
                "vmasks": torch.tensor(b["vmasks"]),
                "tmasks": torch.tensor(b["tmasks"]),
                "label1ds": torch.tensor(b["label1ds"]),
                "NER_labels": torch.tensor(b["NER_labels"], dtype=torch.long)}

    # ---------------- reference loop with eval-in-train ----------------
    optimizer, scheduler = ref_utils.build_optimizer_and_scheduler(ref, cfgs)
    ref_epoch_losses, ref_metrics = [], []
    for _ in range(N_EPOCHS_SP):
        ref.train()
        ep = []
        for b in train_batches:
            loss, _ = ref_seqpan.train_engine_SeqPAN(ref, to_torch(b), cfgs, "train")
            optimizer.zero_grad()
            loss.backward()
            torch.nn.utils.clip_grad_norm_(ref.parameters(), CLIP)
            optimizer.step()
            scheduler.step()
            ep.append(float(loss.detach()))
        ref_epoch_losses.append(np.mean(ep))
        ref.eval()
        ious = []
        with torch.no_grad():
            for b, gt in zip(eval_batches, gts):
                out = ref(torch.tensor(b["words_ids"]), torch.tensor(b["char_ids"]),
                          torch.tensor(b["vfeats"]), torch.tensor(b["vmasks"]),
                          torch.tensor(b["tmasks"]))
                props = ref_engine.infer_basic(out["slogits"], out["elogits"], out["vmask"])
                ious = ref_loss.append_ious(ious, gt, props)
        ref_metrics.append(ref_loss.get_i345_mi(ious))

    # ------------------------- our loop, same schedule -------------------------
    from vmrframe_tpu.config import Derived
    from vmrframe_tpu.metrics import append_ious, get_i345_mi
    from vmrframe_tpu.models.seqpan import seqpan_loss
    from vmrframe_tpu.ops.span import infer_span_1d
    from vmrframe_tpu.registry import get_model_entry
    from vmrframe_tpu.train.optim import build_optimizer

    our_cfg = SimpleNamespace(model=cfgs.model, train=cfgs.train, task="charades")
    model = get_model_entry("SeqPAN").model_cls(
        cfg=our_cfg, derived=Derived(num_words=N_WORDS, num_chars=N_CHARS), word_vectors=wv)
    params, constants = tree["params"], tree["constants"]
    tx = build_optimizer(our_cfg, n_steps)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, batch):
        def lf(p):
            out = model.apply({"params": p, "constants": constants}, batch, True)
            return seqpan_loss(out, batch, our_cfg)

        loss, grads = jax.value_and_grad(lf)(params)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state2, loss

    @jax.jit
    def fwd(params, batch):
        out = model.apply({"params": params, "constants": constants}, batch, True)
        return infer_span_1d(out["slogits"], out["elogits"], batch["vmasks"])

    jbs = [{k: jnp.asarray(v) for k, v in b.items()} for b in train_batches]
    jevs = [{k: jnp.asarray(v) for k, v in b.items()} for b in eval_batches]
    our_epoch_losses, our_metrics = [], []
    for _ in range(N_EPOCHS_SP):
        ep = []
        for jb in jbs:
            params, opt_state, loss = step(params, opt_state, jb)
            ep.append(float(loss))
        our_epoch_losses.append(np.mean(ep))
        ious = []
        for jb, gt in zip(jevs, gts):
            ious = append_ious(ious, gt, np.asarray(fwd(params, jb)))
        our_metrics.append(get_i345_mi(ious))

    np.testing.assert_allclose(
        our_epoch_losses, ref_epoch_losses, rtol=2e-2,
        err_msg="per-epoch mean training losses diverge over 200 steps")
    _assert_metric_trajectories(ref_metrics, our_metrics, 32, "SeqPAN 200-step")
    # the run actually trains
    assert ref_epoch_losses[-1] < ref_epoch_losses[0]
    assert our_metrics[-1][4] != our_metrics[0][4]


# ------------------------------------------------------------------ BAN ----

N_EPOCHS_BAN, STEPS_PER_EPOCH_BAN = 10, 12  # 120 steps (torch BAN is slow on CPU)


def test_ban_long_trajectory_with_eval_metrics(monkeypatch):
    ref_ban_mod = load_ref("models.BAN")
    ref_utils = load_ref("utils.utils")
    ref_loss = load_ref("models.loss")

    ident = lambda x, p=0.0, training=False, inplace=False: x
    monkeypatch.setattr(torch.nn.functional, "dropout", ident)

    from vmrframe_tpu.config import Derived, load_config
    from vmrframe_tpu.metrics import append_ious, get_i345_mi
    from vmrframe_tpu.models.ban import ban_loss
    from vmrframe_tpu.registry import get_model_entry
    from vmrframe_tpu.testing import make_synthetic_data
    from vmrframe_tpu.train.optim import build_optimizer

    n_steps = N_EPOCHS_BAN * STEPS_PER_EPOCH_BAN
    cfg = load_config("tests/configs/charades_ban.json")
    cfg = cfg.updated({
        "model.droprate": 0.0, "train.batch_size": 4, "train.lr": LR,
        "train.warmup_proportion": WARMUP, "train.clip_norm": CLIP,
        "model.pooling_counts": [4, 2, 1],
    })
    dataset, store = make_synthetic_data(
        cfg, seed=3, n_train=4 * STEPS_PER_EPOCH_BAN, n_test=8)
    entry = get_model_entry("BAN")
    derived = Derived(num_words=dataset["n_words"], num_chars=dataset["n_chars"],
                      num_train_steps=n_steps, steps_per_epoch=STEPS_PER_EPOCH_BAN)
    batcher = entry.batcher_cls(dataset["train_set"], store, cfg, derived, "train")
    train_batches = list(batcher.epoch(seed=0, shuffle=False))[:STEPS_PER_EPOCH_BAN]
    ev_batcher = entry.batcher_cls(dataset["test_set"], store, cfg, derived, "test")
    eval_batches = list(ev_batcher.epoch(seed=1, shuffle=False))
    n_eval = sum(int(np.asarray(b["sample_mask"]).sum()) if "sample_mask" in b
                 else len(np.asarray(b["vfeats"])) for b in eval_batches)

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
        train=SimpleNamespace(lr=LR, num_train_steps=n_steps,
                              warmup_proportion=WARMUP, clip_norm=CLIP),
    )
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

    gts = [np.asarray(b["se_fracs"]) for b in eval_batches]

    # ---------------- reference loop with eval-in-train ----------------
    optimizer, scheduler = ref_utils.build_optimizer_and_scheduler(ref_model, cfgs)
    ref_epoch_losses, ref_metrics = [], []
    for _ in range(N_EPOCHS_BAN):
        ref_model.train()
        ep = []
        for b in train_batches:
            loss, _ = ref_ban_mod.train_engine_BAN(ref_model, to_torch(b), cfgs)
            optimizer.zero_grad()
            loss.backward()
            torch.nn.utils.clip_grad_norm_(ref_model.parameters(), CLIP)
            optimizer.step()
            scheduler.step()
            ep.append(float(loss.detach()))
        ref_epoch_losses.append(np.mean(ep))
        ref_model.eval()
        ious = []
        with torch.no_grad():
            for b, gt in zip(eval_batches, gts):
                _, out = ref_ban_mod.train_engine_BAN(ref_model, to_torch(b), cfgs)
                props = ref_ban_mod.infer_BAN(out, cfgs)
                ious = ref_loss.append_ious(ious, gt, props)
        ref_metrics.append(ref_loss.get_i345_mi(ious))

    # ------------------------- our loop, same schedule -------------------------
    ours = entry.model_cls(cfg, derived, wv)
    k = jax.random.PRNGKey(0)
    b0 = {key: jnp.asarray(v) for key, v in train_batches[0].items()}
    variables = jax.tree_util.tree_map(
        np.asarray, ours.init({"params": k, "dropout": k}, b0, True))
    torch.manual_seed(31)
    ref_fresh = ref_ban_mod.BAN(cfgs, pre_train_emb=pre_emb)
    variables = convert_ban_params(ref_fresh, variables)
    params = variables["params"]
    rest = {k2: v for k2, v in variables.items() if k2 != "params"}
    tx = build_optimizer(cfg, n_steps)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, batch):
        def lf(p):
            out = ours.apply({"params": p, **rest}, batch, True)
            return ban_loss(out, batch, cfg)

        loss, grads = jax.value_and_grad(lf)(params)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state2, loss

    @jax.jit
    def fwd(params, batch):
        out = ours.apply({"params": params, **rest}, batch, True)
        return entry.infer_fn(out, batch, cfg)

    jbs = [{k2: jnp.asarray(v) for k2, v in b.items()} for b in train_batches]
    jevs = [{k2: jnp.asarray(v) for k2, v in b.items()} for b in eval_batches]
    our_epoch_losses, our_metrics = [], []
    for _ in range(N_EPOCHS_BAN):
        ep = []
        for jb in jbs:
            params, opt_state, loss = step(params, opt_state, jb)
            ep.append(float(loss))
        our_epoch_losses.append(np.mean(ep))
        ious = []
        for jb, gt in zip(jevs, gts):
            ious = append_ious(ious, gt, np.asarray(fwd(params, jb)))
        our_metrics.append(get_i345_mi(ious))

    np.testing.assert_allclose(
        our_epoch_losses, ref_epoch_losses, rtol=3e-2,
        err_msg="per-epoch mean BAN training losses diverge over 120 steps")
    _assert_metric_trajectories(ref_metrics, our_metrics, n_eval, "BAN 120-step")
