"""Learning-dynamics sanity: with features that actually carry a localizable
signal, the full stack (labels -> model -> losses -> AdamW -> inference)
must drive test mIoU far above chance."""

import numpy as np
import pytest

import jax

from vmrframe_tpu.config import Derived
from vmrframe_tpu.data.batcher import Batcher
from vmrframe_tpu.metrics import get_i345_mi
from vmrframe_tpu.testing import make_synthetic_data
from vmrframe_tpu.train.trainer import Trainer, fit


class SignalStore:
    """Features with a bump inside each video's moment window.

    Every vid carries ONE canonical span; features are informative of it.
    """

    def __init__(self, base_store, span_by_vid, vdim):
        self.base = base_store
        self.spans = span_by_vid
        self.vdim = vdim

    def __getitem__(self, vid):
        f = np.array(self.base[vid])
        T = f.shape[0]
        s, e = self.spans[vid]
        sidx, eidx = int(round(s * (T - 1))), int(round(e * (T - 1)))
        f[sidx : eidx + 1, : self.vdim // 2] += 3.0
        return f

    def lengths(self):
        return self.base.lengths()


@pytest.mark.slow
def test_seqpan_learns_localizable_signal(charades_cfg):
    cfg = charades_cfg.updated({"train.epochs": 12, "train.batch_size": 16,
                                "train.lr": 0.0008})
    dataset, base_store = make_synthetic_data(cfg, seed=0, n_train=96, n_test=48,
                                              n_videos=24)
    # one canonical span per vid; rewrite records to point at it
    rng = np.random.default_rng(0)
    spans = {}
    for vid in base_store.lengths():
        s = float(rng.uniform(0.05, 0.55))
        e = float(rng.uniform(s + 0.2, min(s + 0.5, 0.95)))
        spans[vid] = (s, e)
    for split in ("train_set", "test_set"):
        for r in dataset[split]:
            s, e = spans[r["vid"]]
            r["se_frac"] = [s, e]
            r["se_time"] = [s * r["duration"], e * r["duration"]]
    store = SignalStore(base_store, spans, cfg.model.vdim)

    derived = Derived(num_words=dataset["n_words"], num_chars=dataset["n_chars"])
    train_b = Batcher(dataset["train_set"], store, cfg, derived, "train")
    test_b = Batcher(dataset["test_set"], store, cfg, derived, "test")
    derived.steps_per_epoch = len(train_b)
    derived.num_train_steps = len(train_b) * cfg.train.epochs
    trainer = Trainer(cfg, derived, dataset["word_vector"])

    result = fit(trainer, train_b, test_b, rng_seed=0, log=lambda *_: None)
    assert result["best_miou"] > 55.0, (
        f"SeqPAN failed to learn a trivially localizable signal: "
        f"best test mIoU {result['best_miou']:.1f} (history {result['history']})"
    )
