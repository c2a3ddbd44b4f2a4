"""Offline tooling tail: external-teacher import (EMAT/GMD) and the
time->index equivalence the reference's scripts/repalce_time_to_index.py
demonstrates."""

import json
import os
import pickle

import numpy as np
import pytest

from vmrframe_tpu.tools.export_labels import import_external_labels


def test_import_emat_style(tmp_path):
    """EMAT result tuples (vid, logits, vlen) -> sigmoided (2, L) curves
    (reference scripts/generate_EMAT_label.py)."""
    rng = np.random.default_rng(0)
    entries = [("vidA", rng.normal(size=(2, 48)).astype(np.float32), 48),
               ("vidB", rng.normal(size=(2, 48)).astype(np.float32), 30)]
    src = tmp_path / "emat.pkl"
    with open(src, "wb") as f:
        pickle.dump(entries, f)
    out = import_external_labels(str(src), str(tmp_path / "out.pkl"))
    assert [v for v, _ in out] == ["vidA", "vidB"]
    for (vid, arr), (_, logits, _) in zip(out, entries):
        assert arr.shape == (2, 48)
        np.testing.assert_allclose(arr, 1 / (1 + np.exp(-logits)), atol=1e-6)
    with open(tmp_path / "out.pkl", "rb") as f:
        roundtrip = pickle.load(f)
    assert len(roundtrip) == 2


def test_import_gmd_style(tmp_path):
    """GMD result dicts keep RAW logits (reference scripts/generate_GMD_label.py)."""
    rng = np.random.default_rng(1)
    curves = [rng.normal(size=(64,)).astype(np.float32) for _ in range(2)]
    entries = [{"vid": "v1", "vlen": 64, "prop_logits": curves}]
    src = tmp_path / "gmd.pkl"
    with open(src, "wb") as f:
        pickle.dump(entries, f)
    out = import_external_labels(str(src), str(tmp_path / "out.pkl"))
    vid, arr = out[0]
    assert vid == "v1" and arr.shape == (2, 64)
    np.testing.assert_allclose(arr, np.stack(curves), atol=0)


def test_import_time_major_transposes(tmp_path):
    entries = [("v", np.zeros((48, 2), np.float32), 48)]
    src = tmp_path / "t.pkl"
    with open(src, "wb") as f:
        pickle.dump(entries, f)
    out = import_external_labels(str(src), str(tmp_path / "o.pkl"), apply_sigmoid=False)
    assert out[0][1].shape == (2, 48)


# --------------------------------------------------------- time -> index ---

def _iou_argmax_time_to_index(start_time, end_time, num_units, duration):
    """The reference's candidate-grid IoU-argmax definition
    (scripts/repalce_time_to_index.py:37-44, from the original data prep)."""
    s_times = np.arange(0, num_units).astype(np.float32) / float(num_units) * duration
    e_times = np.arange(1, num_units + 1).astype(np.float32) / float(num_units) * duration
    cand_s = np.repeat(s_times[:, None], num_units, axis=1)
    cand_e = np.repeat(e_times[None, :], num_units, axis=0)
    inter = np.maximum(0.0, np.minimum(cand_e, end_time) - np.maximum(cand_s, start_time))
    union = np.maximum(1e-12, np.maximum(cand_e, end_time) - np.minimum(cand_s, start_time))
    overlaps = inter / union
    return np.argmax(overlaps) // num_units, np.argmax(overlaps) % num_units


def test_time_to_index_matches_iou_argmax():
    """Our round(t/duration*(L-1)) conversion (metrics.time_idx) equals the
    expensive IoU-argmax definition — the equivalence the reference's
    scripts/repalce_time_to_index.py was written to demonstrate."""
    from vmrframe_tpu.metrics import time_idx

    # NB the reference script's own final asserts are commented out
    # (repalce_time_to_index.py:95-96): the two conventions differ by half a
    # grid cell, so they agree within ONE index with consistent signs
    # (IoU-argmax's start grid i·d/L sits left of round(t/d·(L-1))'s cell,
    # its end grid (i+1)·d/L right of it).  Measured on 500 random cases:
    # start diff ∈ {0, +1}, end diff ∈ {0, −1}, never more.
    rng = np.random.default_rng(2)
    for _ in range(300):
        duration = float(rng.uniform(5, 120))
        L = int(rng.integers(8, 128))
        s = float(rng.uniform(0, duration * 0.8))
        e = float(rng.uniform(s + duration * 0.05, duration))
        si, ei = _iou_argmax_time_to_index(s, e, L, duration)
        sdiff = int(si) - time_idx(s, duration, L)
        ediff = int(ei) - time_idx(e, duration, L)
        assert sdiff in (0, 1), (s, duration, L, sdiff)
        assert ediff in (0, -1), (e, duration, L, ediff)


def test_prepare_ban_one_command(tmp_path):
    """--mode prepare-ban cleans both splits of the shipped charades
    annotations into the charades_clean layout BAN.json points at
    (reference config/charades/BAN.json:10-11)."""
    from vmrframe_tpu.tools.clean_data import prepare_ban

    src = "/root/reference/data/charades_gt"
    if not os.path.isdir(src):
        pytest.skip("reference annotations not present")
    written = prepare_ban(src, str(tmp_path / "charades_clean"))
    assert [os.path.basename(p) for p, _ in written] == ["train.json", "test.json"]
    for path, n in written:
        with open(path, encoding="utf8") as f:
            records = json.load(f)
        assert len(records) == n and n > 0
        vid, duration, span, sentence, sample_id = records[0]
        assert duration >= span[1] and isinstance(sample_id, int)
