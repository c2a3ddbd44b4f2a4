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


def test_dilation_device_semantics():
    """Device dilation (index remapping, ops/input_pipeline.py::_dilate) has
    the reference's feature_dilation semantics (utils/data_utils.py:88-120):
    pads are windows of NEGATIVE frames, the gt span shifts by head_len, and
    p=0 degenerates to the unchanged path."""
    cfg = _cfg({"dilation": 0.3})
    dataset, store = make_synthetic_data(cfg, seed=3, n_train=16, n_test=4)
    raw, lens, fracs = _raw_batch(cfg, dataset, store, list(range(16)))
    dev = device_augment_resample(jnp.asarray(raw), jnp.asarray(lens), jnp.asarray(fracs),
                                  9, vlen=cfg.model.vlen, aug_mode="dilation",
                                  erosion_p=0.3, sample_type="truncation")
    vfeats = np.asarray(dev["vfeats"])
    label1ds = np.asarray(dev["label1ds"])
    assert vfeats.shape == (16, cfg.model.vlen, cfg.model.vdim)
    assert np.isfinite(vfeats).all()
    # every sample keeps a non-empty gt
    assert np.allclose(label1ds.max(axis=-1), 1.0)
    # deterministic given seed
    dev2 = device_augment_resample(jnp.asarray(raw), jnp.asarray(lens), jnp.asarray(fracs),
                                   9, vlen=cfg.model.vlen, aug_mode="dilation",
                                   erosion_p=0.3, sample_type="truncation")
    np.testing.assert_array_equal(vfeats, np.asarray(dev2["vfeats"]))

    # p=0 -> identical to the unchanged path (no pads drawn)
    dev0 = device_augment_resample(jnp.asarray(raw), jnp.asarray(lens), jnp.asarray(fracs),
                                   9, vlen=cfg.model.vlen, aug_mode="dilation",
                                   erosion_p=0.0, sample_type="truncation")
    base = device_augment_resample(jnp.asarray(raw), jnp.asarray(lens), jnp.asarray(fracs),
                                   9, vlen=cfg.model.vlen, aug_mode="unchanged",
                                   sample_type="truncation")
    np.testing.assert_allclose(np.asarray(dev0["vfeats"]), np.asarray(base["vfeats"]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(dev0["label1ds"]), np.asarray(base["label1ds"]), atol=1e-6)


def test_dilation_pad_frames_come_from_negative_pool():
    """Without resampling, pad rows must be copies of negative (outside-gt)
    raw frames — never gt frames, never fabricated values."""
    vlen, vdim, T = 32, 8, 20
    raw = np.zeros((1, T, vdim), np.float32)
    rng = np.random.default_rng(0)
    raw[0, :] = rng.normal(size=(T, vdim))
    # gt occupies the middle half
    fracs = np.asarray([[0.25, 0.6]], np.float32)
    sidx, eidx = round(0.25 * (T - 1)), round(0.6 * (T - 1))
    dev = device_augment_resample(jnp.asarray(raw), jnp.asarray([T], jnp.int32),
                                  jnp.asarray(fracs), 123, vlen=vlen,
                                  aug_mode="dilation", erosion_p=0.3,
                                  sample_type="truncation")
    out = np.asarray(dev["vfeats"])[0]
    vmask = np.asarray(dev["vmasks"])[0]
    out_len = int(vmask.sum())
    neg_rows = {tuple(np.round(raw[0, i], 5)) for i in range(T) if not (sidx <= i <= eidx)}
    all_rows = {tuple(np.round(raw[0, i], 5)) for i in range(T)}
    # find the body: the contiguous copy of raw inside out
    for i in range(out_len):
        row = tuple(np.round(out[i], 5))
        assert row in all_rows, f"frame {i} is not a raw frame"
        if row not in neg_rows:
            continue
    # count: body length == T, so pads = out_len - T, all from the neg pool
    body_hits = sum(1 for i in range(out_len) if tuple(np.round(out[i], 5)) in all_rows - neg_rows)
    assert body_hits == eidx - sidx + 1  # every gt frame appears exactly once
