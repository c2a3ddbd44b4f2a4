"""On-device input pipeline vs the host (numpy) pipeline."""

import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vmrframe_tpu.config import Config, Derived
from vmrframe_tpu.data.batcher import Batcher
from vmrframe_tpu.ops.input_pipeline import device_augment_resample
from vmrframe_tpu.testing import make_synthetic_data


def _cfg(aug, sample_type="truncation", vlen=32):
    return Config({
        "task": "charades",
        "paths": {"ckpt_dir": "/tmp", "cache_dir": "/tmp", "feature_path": "",
                  "glove_path": "", "train_path": "", "test_path": "", "val_path": ""},
        "train": {"epochs": 1, "batch_size": 16, "lr": 8e-4, "warmup_proportion": 0.0,
                  "clip_norm": 1.0},
        "dataprocess": {"video_augmentation": aug, "sample_type": sample_type,
                        "label_threshold": 0.01},
        "model": {"name": "SeqPAN", "vlen": vlen, "tlen": 12, "vdim": 24, "dim": 16,
                  "num_heads": 4, "word_dim": 50, "char_dim": 16, "droprate": 0.1},
    })


def _raw_batch(cfg, dataset, store, indices):
    max_raw = max(store.lengths().values())
    B = len(indices)
    raw = np.zeros((B, max_raw, cfg.model.vdim), np.float32)
    lens = np.zeros((B,), np.int32)
    fracs = np.zeros((B, 2), np.float32)
    for i, idx in enumerate(indices):
        r = dataset["train_set"][idx]
        f = store[r["vid"]]
        raw[i, : f.shape[0]] = f
        lens[i] = f.shape[0]
        fracs[i] = r["se_frac"]
    return raw, lens, fracs


def test_unchanged_truncation_matches_host_exactly():
    cfg = _cfg({"unchanged": None})
    dataset, store = make_synthetic_data(cfg, seed=0, n_train=16, n_test=4)
    derived = Derived(num_words=dataset["n_words"], num_chars=dataset["n_chars"])
    batcher = Batcher(dataset["train_set"], store, cfg, derived, "train")
    indices = list(range(16))
    host = batcher.make_batch(indices, random.Random(0))

    raw, lens, fracs = _raw_batch(cfg, dataset, store, indices)
    dev = device_augment_resample(jnp.asarray(raw), jnp.asarray(lens), jnp.asarray(fracs),
                                  0, vlen=cfg.model.vlen, aug_mode="unchanged",
                                  sample_type="truncation")
    np.testing.assert_allclose(np.asarray(dev["vfeats"]), host["vfeats"], atol=2e-5)
    np.testing.assert_array_equal(np.asarray(dev["vmasks"]), host["vmasks"])
    np.testing.assert_allclose(np.asarray(dev["label1ds"]), host["label1ds"], atol=1e-5)
    np.testing.assert_array_equal(np.asarray(dev["NER_labels"]), host["NER_labels"])


def test_samelen_matches_host_exactly():
    cfg = _cfg({"unchanged": None}, sample_type="samelen")
    dataset, store = make_synthetic_data(cfg, seed=1, n_train=16, n_test=4)
    derived = Derived(num_words=dataset["n_words"], num_chars=dataset["n_chars"])
    batcher = Batcher(dataset["train_set"], store, cfg, derived, "train")
    indices = list(range(16))
    host = batcher.make_batch(indices, random.Random(0))
    raw, lens, fracs = _raw_batch(cfg, dataset, store, indices)
    dev = device_augment_resample(jnp.asarray(raw), jnp.asarray(lens), jnp.asarray(fracs),
                                  0, vlen=cfg.model.vlen, aug_mode="unchanged",
                                  sample_type="samelen")
    np.testing.assert_allclose(np.asarray(dev["vfeats"]), host["vfeats"], atol=2e-5)
    np.testing.assert_allclose(np.asarray(dev["label1ds"]), host["label1ds"], atol=1e-5)
    np.testing.assert_array_equal(np.asarray(dev["NER_labels"]), host["NER_labels"])


def test_erosion_keeps_gt_and_shapes():
    cfg = _cfg({"erosion": 0.05})
    dataset, store = make_synthetic_data(cfg, seed=2, n_train=16, n_test=4)
    raw, lens, fracs = _raw_batch(cfg, dataset, store, list(range(16)))
    dev = device_augment_resample(jnp.asarray(raw), jnp.asarray(lens), jnp.asarray(fracs),
                                  7, vlen=cfg.model.vlen, aug_mode="erosion",
                                  erosion_p=0.05, sample_type="truncation")
    vfeats = np.asarray(dev["vfeats"])
    label1ds = np.asarray(dev["label1ds"])
    ners = np.asarray(dev["NER_labels"])
    assert vfeats.shape == (16, cfg.model.vlen, cfg.model.vdim)
    assert np.isfinite(vfeats).all()
    # every sample keeps a non-empty gt: boundary heatmaps peak at 1
    assert np.allclose(label1ds.max(axis=-1), 1.0)
    # O/B/I/E labels contain boundary classes
    assert all((n == 1).any() or (n == 3).any() for n in ners)
    # deterministic given seed
    dev2 = device_augment_resample(jnp.asarray(raw), jnp.asarray(lens), jnp.asarray(fracs),
                                   7, vlen=cfg.model.vlen, aug_mode="erosion",
                                   erosion_p=0.05, sample_type="truncation")
    np.testing.assert_array_equal(vfeats, np.asarray(dev2["vfeats"]))
