"""Golden tests over the reference's SHIPPED annotation JSONs — the real
Charades/ANet/TACoS files drive our offline pipeline end-to-end (tokenize,
id-mapping, se_frac invariants, cache roundtrip)."""

import os

import numpy as np
import pytest

REF = "/root/reference/data"

pytestmark = pytest.mark.skipif(not os.path.isdir(REF), reason="reference data not mounted")


def test_process_data_charades_train():
    from vmrframe_tpu.data.datasets import process_data

    records = process_data(os.path.join(REF, "charades_gt", "train.json"))
    assert len(records) == 12408
    r0 = records[0]
    assert r0["vid"] == "AO8RW"
    assert r0["words"] == ["a", "person", "is", "putting", "a", "book", "on", "a", "shelf", "."]
    assert r0["duration"] == 33.67
    for r in records[:200]:
        assert 0.0 <= r["stime"] <= r["duration"] + 1e-6


@pytest.mark.parametrize("task,split,n_expected", [
    ("charades_gt", "test.json", 3720),
    ("tacos", "train.json", 9790),
    ("anet_i3d_gt", "val.json", None),
])
def test_other_annotation_files_parse(task, split, n_expected):
    from vmrframe_tpu.data.datasets import process_data

    records = process_data(os.path.join(REF, task, split))
    if n_expected is not None:
        assert len(records) == n_expected
    assert all(isinstance(r["words"], list) and r["words"] for r in records[:50])


def test_dataset_gen_and_cache_roundtrip(tmp_path):
    """Full generate_dataset on real charades annotations with synthetic
    feature lengths + a no-GloVe vocab, then cache reload."""
    import json

    from vmrframe_tpu.config import Config, Derived
    from vmrframe_tpu.data.datasets import load_dataset, process_data

    # subset the real files for speed
    for split in ("train", "test"):
        with open(os.path.join(REF, "charades_gt", f"{split}.json"), encoding="utf8") as f:
            data = json.load(f)[:300]
        with open(tmp_path / f"{split}.json", "w", encoding="utf8") as f:
            json.dump(data, f)

    cfg = Config({
        "task": "charades",
        "paths": {"cache_dir": str(tmp_path / "cache"), "glove_path": "",
                  "train_path": str(tmp_path / "train.json"),
                  "test_path": str(tmp_path / "test.json"), "val_path": "",
                  "feature_path": ""},
        "model": {"tlen": 30, "word_dim": 50},
    })
    derived = Derived(suffix="golden")
    vids = {r[0] for r in json.load(open(tmp_path / "train.json"))} | {
        r[0] for r in json.load(open(tmp_path / "test.json"))}
    vfeat_lens = {v: 64 for v in vids}

    ds = load_dataset(cfg, derived, vfeat_lens=vfeat_lens)
    assert ds["n_train"] > 0 and ds["n_test"] > 0
    assert ds["word_vector"].shape == (ds["n_words"] - 2, 50)
    sample = ds["train_set"][0]
    assert 0.0 <= sample["se_frac"][0] <= sample["se_frac"][1] <= 1.0
    assert all(w < ds["n_words"] for w in sample["wids"])
    assert all(c < ds["n_chars"] for cs in sample["cids"] for c in cs)

    # cache hit returns the identical payload
    ds2 = load_dataset(cfg, derived, vfeat_lens=vfeat_lens)
    assert ds2["n_train"] == ds["n_train"]
    np.testing.assert_array_equal(ds2["word_vector"], ds["word_vector"])
