"""Offline dataset preparation + cache.

Reproduces the reference's utils/data_gen.py pipeline: JSON annotations
(``[vid, duration, [stime, etime], sentence, (sample_id)]``) → tokenized
records → word/char vocab filtered by GloVe → word/char id sequences
truncated at ``tlen`` → one pickle cache per (task, suffix).

Cache layout is byte-compatible in spirit with the reference
(data_gen.py:174-179): a dict of train/val/test record lists + vocab dicts +
the embedding matrix + counts.
"""

from __future__ import annotations

import json
import os
import pickle
from typing import Dict, List, Optional

import numpy as np

from vmrframe_tpu.data.glove import UNK, vocab_emb_gen
from vmrframe_tpu.data.tokenize import word_tokenize


def load_json(filename: str):
    with open(filename, encoding="utf8") as fr:
        return json.load(fr)


def save_pickle(data, filename: str):
    with open(filename, mode="wb") as handle:
        pickle.dump(data, handle, protocol=pickle.HIGHEST_PROTOCOL)


def load_pickle(filename: str):
    with open(filename, mode="rb") as handle:
        return pickle.load(handle)


def process_data(data_file: str) -> List[dict]:
    """JSON annotation list -> tokenized record dicts (data_gen.py:14-29)."""
    data = load_json(data_file)
    results = []
    for record in data:
        vid, duration, (stime, etime), sentence = record[:4]
        words = word_tokenize(sentence)
        results.append(
            {
                "vid": str(vid),
                "stime": stime,
                "etime": etime,
                "duration": round(duration, 2),
                "sentence": sentence,
                "words": words,
            }
        )
    return results


def dataset_gen(
    data: List[dict],
    vfeat_lens: Dict[str, int],
    word_dict: Dict[str, int],
    char_dict: Dict[str, int],
    max_tlen: int,
    scope: str,
) -> List[dict]:
    """Records -> id-mapped samples (data_gen.py:102-151).

    Keeps the reference's semantics: drop records whose video has no
    features; clamp etime to duration; se_frac = time/duration asserted in
    [0, 1]; word/char ids truncated at max_tlen.
    """
    dataset = []
    for record in data:
        vid = record["vid"]
        if vid not in vfeat_lens:
            continue
        if record["etime"] > record["duration"]:
            record = dict(record, etime=record["duration"])
        sfrac = record["stime"] / record["duration"]
        efrac = record["etime"] / record["duration"]
        assert 0.0 <= sfrac <= 1.0, record
        assert 0.0 <= efrac <= 1.0, record
        word_ids, char_ids = [], []
        for word in record["words"][0:max_tlen]:
            word_ids.append(word_dict.get(word, word_dict[UNK]))
            char_ids.append([char_dict.get(c, char_dict[UNK]) for c in word])
        dataset.append(
            {
                "vid": vid,
                "se_time": [record["stime"], record["etime"]],
                "duration": record["duration"],
                "se_frac": [sfrac, efrac],
                "sentence": record["sentence"],
                "words": record["words"],
                "wids": word_ids,
                "cids": char_ids,
            }
        )
    return dataset


def generate_dataset(configs, cache_path: str, vfeat_lens: Optional[Dict[str, int]] = None):
    """Full offline prep -> cache pickle (data_gen.py:154-180)."""
    if vfeat_lens is None:
        vfeat_lens = scan_feature_lengths(configs.paths.feature_path)
    train_data = process_data(configs.paths.train_path)
    test_data = process_data(configs.paths.test_path)
    val_path = configs.paths.get("val_path", "")
    data_list = [train_data, test_data]
    val_data = None
    if val_path:
        val_data = process_data(val_path)
        data_list = [train_data, val_data, test_data]

    word_dict, char_dict, vectors = vocab_emb_gen(
        data_list, configs.paths.glove_path, word_dim=configs.model.word_dim
    )
    tlen = configs.model.tlen
    train_set = dataset_gen(train_data, vfeat_lens, word_dict, char_dict, tlen, "train")
    test_set = dataset_gen(test_data, vfeat_lens, word_dict, char_dict, tlen, "test")
    val_set = (
        dataset_gen(val_data, vfeat_lens, word_dict, char_dict, tlen, "val") if val_data else None
    )

    dataset = {
        "train_set": train_set,
        "val_set": val_set,
        "test_set": test_set,
        "word_dict": word_dict,
        "char_dict": char_dict,
        "word_vector": vectors,
        "n_train": len(train_set),
        "n_val": len(val_set) if val_set else 0,
        "n_test": len(test_set),
        "n_words": len(word_dict),
        "n_chars": len(char_dict),
    }
    save_pickle(dataset, cache_path)
    return dataset


def scan_feature_lengths(feature_dir: str) -> Dict[str, int]:
    """vid -> num frames, by reading .npy headers only (cheaper than the
    reference's full np.load per file, data_gen.py:90-99)."""
    import glob as globlib

    vfeat_lens = {}
    for vpath in globlib.glob(os.path.join(feature_dir, "*.npy")):
        vid = os.path.basename(vpath)[:-4]
        with open(vpath, "rb") as f:
            version = np.lib.format.read_magic(f)
            shape, _, _ = np.lib.format._read_array_header(f, version)
        vfeat_lens[vid] = shape[0]
    return vfeat_lens


def load_dataset(configs, derived, vfeat_lens: Optional[Dict[str, int]] = None):
    """Cache-or-generate (data_gen.py:82-87)."""
    os.makedirs(configs.paths.cache_dir, exist_ok=True)
    cache_path = os.path.join(
        configs.paths.cache_dir, "{}_{}.pkl".format(configs.task, derived.suffix)
    )
    if not os.path.exists(cache_path):
        return generate_dataset(configs, cache_path, vfeat_lens=vfeat_lens)
    return load_pickle(cache_path)
