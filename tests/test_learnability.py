"""Learning-dynamics sanity across the WHOLE zoo: with features that
actually carry a localizable signal, each model family's full stack
(labels -> model -> losses -> AdamW -> inference) must drive test mIoU far
above its untrained baseline — the only reachable accuracy evidence while
the real C3D/I3D features are absent (reference main.py:80-135 semantics).

Supervised families (SeqPAN, BAN, CCA, ActionFormer) get a feature bump
inside the target span.  Weakly-supervised CPL has no boundary labels, so
its signal is reconstruction-shaped: the caption's words are determined by
the span's position bucket AND written into the features inside the span —
the min-NLL proposal then aligns with the span only if the Gaussian
proposals learn to localize.
"""

import os

import numpy as np
import pytest

import jax

from vmrframe_tpu.config import Derived, load_config
from vmrframe_tpu.data.batcher import Batcher
from vmrframe_tpu.registry import get_model_entry
from vmrframe_tpu.testing import make_synthetic_data
from vmrframe_tpu.train.trainer import Trainer, fit

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "configs")


class SignalStore:
    """Features with a bump inside each video's moment window.

    Every vid carries ONE canonical span; features are informative of it.
    With ``buckets``, the bump lands in a span-position-dependent channel
    slice (the CPL word-signal variant).
    """

    def __init__(self, base_store, span_by_vid, vdim, buckets=None):
        self.base = base_store
        self.spans = span_by_vid
        self.vdim = vdim
        self.buckets = buckets  # vid -> bucket int, or None

    def __getitem__(self, vid):
        f = np.array(self.base[vid])
        T = f.shape[0]
        s, e = self.spans[vid]
        sidx, eidx = int(round(s * (T - 1))), int(round(e * (T - 1)))
        if self.buckets is None:
            f[sidx : eidx + 1, : self.vdim // 2] += 3.0
        else:
            b = self.buckets[vid]
            m = self.vdim // 8
            f[sidx : eidx + 1, b * m : (b + 1) * m] += 3.0
        return f

    def lengths(self):
        return self.base.lengths()


def _canonical_span_data(cfg, seed=0, n_train=96, n_test=48, n_videos=24,
                         word_signal=False):
    dataset, base_store = make_synthetic_data(cfg, seed=seed, n_train=n_train,
                                              n_test=n_test, n_videos=n_videos)
    rng = np.random.default_rng(seed)
    spans, buckets = {}, {}
    for vid in base_store.lengths():
        s = float(rng.uniform(0.05, 0.55))
        e = float(rng.uniform(s + 0.2, min(s + 0.5, 0.95)))
        spans[vid] = (s, e)
        buckets[vid] = min(int((s + e) / 2 * 4), 3)
    word_list = [w for w in dataset["word_dict"] if w not in ("<PAD>", "<UNK>")]
    for split in ("train_set", "test_set"):
        for r in dataset[split]:
            s, e = spans[r["vid"]]
            r["se_frac"] = [s, e]
            r["se_time"] = [s * r["duration"], e * r["duration"]]
            if word_signal:
                # caption determined by the span's position bucket
                b = buckets[r["vid"]]
                words = [word_list[b * 3 + k] for k in (0, 1, 2)] * 2
                r["words"] = words
                r["sentence"] = " ".join(words)
                r["wids"] = [dataset["word_dict"][w] for w in words]
                r["cids"] = [[dataset["char_dict"].get(c, 1) for c in w] for w in words]
    store = SignalStore(base_store, spans, cfg.model.vdim,
                        buckets=buckets if word_signal else None)
    return dataset, store


def _run(cfg, dataset, store, seed=0):
    """(untrained test mIoU, best test mIoU after fit)."""
    from vmrframe_tpu.metrics import get_i345_mi

    entry = get_model_entry(cfg.model.name)
    batcher_cls = entry.batcher_cls or Batcher
    derived = Derived(num_words=dataset["n_words"], num_chars=dataset["n_chars"])
    train_b = batcher_cls(dataset["train_set"], store, cfg, derived, "train")
    test_b = batcher_cls(dataset["test_set"], store, cfg, derived, "test")
    derived.steps_per_epoch = len(train_b)
    derived.num_train_steps = len(train_b) * cfg.train.epochs
    trainer = Trainer(cfg, derived, dataset["word_vector"])

    # untrained baseline = "chance" for this model's inference protocol
    state0 = trainer.init_state(jax.random.PRNGKey(seed), next(train_b.epoch(seed=seed)))
    ious0, _, _ = trainer.run_eval_epoch(state0, test_b.epoch(seed=0))
    init_miou = get_i345_mi(ious0)[4]

    result = fit(trainer, train_b, test_b, rng_seed=seed, log=lambda *_: None)
    return init_miou, result["best_miou"], result["history"]


ZOO = {
    # model: (config file, cfg updates, min absolute mIoU, min gain over untrained)
    "SeqPAN": ("charades_seqpan.yaml", {}, 55.0, 15.0),
    # BAN's inference argmaxes the RAW tmap with invalid cells at 0 (the
    # reference's infer_BAN quirk), so nothing non-degenerate is emitted
    # until some valid logit crosses 0; at lr 8e-4 the 5-term objective
    # never gets there on this tiny task (measured flat-zero through 40
    # epochs), at lr 2e-3 it crosses ~epoch 30 and lands at mIoU ~87.
    "BAN": ("charades_ban.json", {"train.lr": 0.002, "train.epochs": 40},
            55.0, 15.0),
    "CCA": ("anet_cca.yaml", {}, 55.0, 15.0),
    "ActionFormer": ("charades_actionformer.yaml", {}, 55.0, 15.0),
    # weakly supervised: no boundary labels at all — the bar is a clear gain
    # over the untrained center-prior, not supervised-level mIoU
    "CPL": ("charades_seqpan.yaml",
            {"model.name": "CPL",
             "others": {"cpl_num_props": 8, "cpl_div_lambda": 0.15,
                        "cpl_div_loss_alhpa": 1.0}},
            35.0, 8.0),
}


@pytest.mark.slow
@pytest.mark.parametrize("model", list(ZOO))
def test_zoo_learns_localizable_signal(model):
    config, updates, absolute, gain = ZOO[model]
    cfg = load_config(os.path.join(CONFIG_DIR, config))
    cfg = cfg.updated({"train.epochs": 12, "train.batch_size": 16,
                       "train.lr": 0.0008, **updates})
    dataset, store = _canonical_span_data(cfg, word_signal=(model == "CPL"))
    init_miou, best_miou, history = _run(cfg, dataset, store)
    assert best_miou > absolute and best_miou > init_miou + gain, (
        f"{model} failed to learn a localizable signal: untrained mIoU "
        f"{init_miou:.1f} -> best {best_miou:.1f} "
        f"(need >{absolute} and a +{gain} gain; history {history})"
    )
