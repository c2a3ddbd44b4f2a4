"""Head-to-head TRAINING trajectory: the reference's real trainer loop vs
ours, same init, same data, same seed.

Drives the reference's own train_engine_SeqPAN (models/SeqPAN.py:171-182)
+ build_optimizer_and_scheduler (utils/utils.py:87-97) + the main.py step
sequence (zero_grad/backward/clip_grad_norm_/step/scheduler.step,
main.py:93-97) on synthetic batches, next to our jitted value_and_grad +
optax pipeline (vmrframe_tpu/train/optim.py) — starting from IDENTICAL
weights (the torch init converted through tools/convert_torch.py).

Per-step losses must agree: this is external, non-self-referential evidence
that forward, losses, gradients, AdamW (incl. the no-decay groups), the HF
warmup schedule and global-norm clipping all match the reference.

Shims (documented reference bugs, both applied test-side):
- TopSelfAttention2's (B,L,E)->(L,B,E) convention bug (models/layers.py:567-574);
- gumbel noise patched to its deterministic limit on both sides so the
  trajectories are comparable (the reference draws noise with torch's RNG,
  ours with jax's — no common stream exists).
"""

from __future__ import annotations

from types import SimpleNamespace

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

try:
    from tests._reference import load as load_ref
    from tests.test_reference_modules_parity import _fix_top_self_attention2, cfg_ns
except ImportError:
    from _reference import load as load_ref
    from test_reference_modules_parity import _fix_top_self_attention2, cfg_ns

from vmrframe_tpu.tools.convert_torch import convert_seqpan_family

B, LV, LT, CC = 8, 16, 8, 12
DIM, VDIM, WORD_DIM, CHAR_DIM = 32, 24, 50, 100
N_WORDS, N_CHARS = 40, 20
N_STEPS = 12
LR, WARMUP, CLIP = 8e-4, 0.1, 1.0


def make_batches(rng, n):
    batches = []
    for _ in range(n):
        words = rng.integers(1, N_WORDS + 2, size=(B, LT))
        words[:, -2:] = 0
        chars = rng.integers(0, N_CHARS, size=(B, LT, CC))
        vfeats = rng.normal(size=(B, LV, VDIM)).astype(np.float32)
        vlens = rng.integers(6, LV + 1, size=B)
        vmask = (np.arange(LV)[None] < vlens[:, None]).astype(np.float32)
        tmask = (words != 0).astype(np.float32)
        lab = rng.random(size=(B, 2, LV)).astype(np.float32) * vmask[:, None, :]
        lab /= lab.sum(-1, keepdims=True)
        ner = rng.integers(0, 4, size=(B, LV))
        ner[:, 0] = 3  # keep all 4 classes present (reference F.one_hot
        ner[:, 1] = 0  # infers width from the batch max, loss.py:28)
        ner = ner * (vmask > 0)
        batches.append(dict(words_ids=words, char_ids=chars, vfeats=vfeats,
                            vmasks=vmask, tmasks=tmask, label1ds=lab,
                            NER_labels=ner))
    return batches


def test_training_trajectory_matches_reference(monkeypatch):
    ref_layers = load_ref("models.layers")
    ref_seqpan = load_ref("models.SeqPAN")
    ref_utils = load_ref("utils.utils")

    monkeypatch.setattr(ref_layers.TopSelfAttention2, "forward",
                        _fix_top_self_attention2(ref_layers))
    monkeypatch.setattr(ref_seqpan.F, "gumbel_softmax",
                        lambda logits, tau=1.0, hard=False: torch.softmax(logits / tau, dim=-1))

    rng = np.random.default_rng(11)
    torch.manual_seed(11)
    wv = rng.normal(size=(N_WORDS, WORD_DIM)).astype(np.float32)
    cfgs = cfg_ns(dim=DIM, vlen=LV, tlen=LT, vdim=VDIM, word_dim=WORD_DIM,
                  char_dim=CHAR_DIM, droprate=0.0, num_words=N_WORDS, num_chars=N_CHARS)
    cfgs.train = SimpleNamespace(lr=LR, num_train_steps=N_STEPS,
                                 warmup_proportion=WARMUP, clip_norm=CLIP)

    ref = ref_seqpan.SeqPAN(cfgs, wv).train()
    # Move label_embs OFF its orthogonal init: the reference's orthogonality
    # penalty is ||offdiag(EᵀE)||₂, which is exactly 0 at init — the norm's
    # gradient x/||x|| is 0/0 there and both frameworks emit arbitrary
    # rounding-driven subgradients (verified by finite differences: the true
    # directional derivatives are tiny and EQUAL across frameworks).  A small
    # perturbation makes the gradient well-conditioned so the trajectories
    # are comparable; the reference has the same pathology on its own first
    # step (models/loss.py:37-39).
    with torch.no_grad():
        ref.label_embs.add_(0.05 * torch.randn_like(ref.label_embs))
    tree = convert_seqpan_family(ref.state_dict())  # identical starting point
    batches = make_batches(rng, N_STEPS)

    # ---------------- the reference's own loop (main.py:80-97) ----------------
    optimizer, scheduler = ref_utils.build_optimizer_and_scheduler(ref, cfgs)
    torch_losses = []
    for b in batches:
        tb = {
            "words_ids": torch.tensor(b["words_ids"]),
            "char_ids": torch.tensor(b["char_ids"]),
            "vfeats": torch.tensor(b["vfeats"]),
            "vmasks": torch.tensor(b["vmasks"]),
            "tmasks": torch.tensor(b["tmasks"]),
            "label1ds": torch.tensor(b["label1ds"]),
            "NER_labels": torch.tensor(b["NER_labels"], dtype=torch.long),
        }
        loss, _ = ref_seqpan.train_engine_SeqPAN(ref, tb, cfgs, "train")
        optimizer.zero_grad()
        loss.backward()
        torch.nn.utils.clip_grad_norm_(ref.parameters(), CLIP)
        optimizer.step()
        scheduler.step()
        torch_losses.append(float(loss))

    # ------------------------------- our loop --------------------------------
    from vmrframe_tpu.config import Derived
    from vmrframe_tpu.models.seqpan import seqpan_loss
    from vmrframe_tpu.registry import get_model_entry
    from vmrframe_tpu.train.optim import build_optimizer

    our_cfg = SimpleNamespace(model=cfgs.model, train=cfgs.train, task="charades")
    model = get_model_entry("SeqPAN").model_cls(
        cfg=our_cfg, derived=Derived(num_words=N_WORDS, num_chars=N_CHARS), word_vectors=wv)
    params, constants = tree["params"], tree["constants"]
    tx = build_optimizer(our_cfg, N_STEPS)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, batch):
        def loss_fn(p):
            out = model.apply({"params": p, "constants": constants}, batch, True)
            return seqpan_loss(out, batch, our_cfg)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        return optax_apply(params, updates), opt_state2, loss

    import optax

    def optax_apply(params, updates):
        return optax.apply_updates(params, updates)

    jax_losses = []
    for b in batches:
        jb = {k: jnp.asarray(v) for k, v in b.items()}
        params, opt_state, loss = step(params, opt_state, jb)
        jax_losses.append(float(loss))

    np.testing.assert_allclose(
        jax_losses, torch_losses, rtol=2e-3, atol=2e-3,
        err_msg="per-step training losses diverge from the reference trainer")
    # and the trajectories actually train (not a constant function)
    assert torch_losses[-1] < torch_losses[0]
