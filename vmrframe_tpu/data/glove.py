"""GloVe vocabulary + embedding extraction.

Mirrors the reference's two-pass scheme (utils/data_gen.py:31-78): first a
vocabulary scan to find which corpus words have pretrained vectors, then a
second scan extracting those vectors in word-frequency order.  Output layout
is identical: row 0 = PAD (all-zero, frozen), row 1 = UNK (trainable), rows
2.. = frozen GloVe vectors for in-vocab words ordered by corpus frequency.

When the GloVe file is absent (tests / synthetic runs) we fall back to
deterministic random vectors for every corpus word so the rest of the
pipeline is exercised unchanged.
"""

from __future__ import annotations

import codecs
import os
from collections import Counter
from typing import Dict, List, Sequence, Set, Tuple

import numpy as np

PAD, UNK = "<PAD>", "<UNK>"


def load_glove_vocab(glove_path: str) -> Set[str]:
    vocab = []
    with codecs.open(glove_path, mode="r", encoding="utf-8") as f:
        for line in f:
            parts = line.lstrip().rstrip().split(" ")
            if len(parts) == 2 or len(parts) != 301:
                continue
            vocab.append(parts[0])
    return set(vocab)


def filter_glove_embedding(word_dict: Dict[str, int], glove_path: str, dim: int = 300) -> np.ndarray:
    vectors = np.zeros(shape=[len(word_dict), dim], dtype=np.float32)
    with codecs.open(glove_path, mode="r", encoding="utf-8") as f:
        for line in f:
            parts = line.lstrip().rstrip().split(" ")
            if len(parts) == 2 or len(parts) != dim + 1:
                continue
            word = parts[0]
            if word in word_dict:
                vectors[word_dict[word]] = np.asarray([float(x) for x in parts[1:]])
    return vectors


def vocab_emb_gen(
    datasets: Sequence[Sequence[dict]], glove_path: str, word_dim: int = 300, char_min_count: int = 5
) -> Tuple[Dict[str, int], Dict[str, int], np.ndarray]:
    """Build word/char vocabularies + the filtered embedding matrix.

    Reference: utils/data_gen.py:57-78.  Word vocab = corpus words that exist
    in GloVe, ordered by corpus frequency; char vocab = chars with count>=5.
    """
    word_counter: Counter = Counter()
    char_counter: Counter = Counter()
    for data in datasets:
        for record in data:
            for word in record["words"]:
                word_counter[word] += 1
                for char in word:
                    char_counter[char] += 1

    have_glove = glove_path and os.path.exists(glove_path)
    if have_glove:
        emb_vocab = load_glove_vocab(glove_path)
        word_vocab = [w for w, _ in word_counter.most_common() if w in emb_vocab]
        tmp_word_dict = {w: i for i, w in enumerate(word_vocab)}
        vectors = filter_glove_embedding(tmp_word_dict, glove_path, dim=word_dim)
    else:
        # synthetic fallback: every corpus word, deterministic random vectors
        word_vocab = [w for w, _ in word_counter.most_common()]
        rng = np.random.default_rng(0)
        vectors = rng.standard_normal((len(word_vocab), word_dim)).astype(np.float32) * 0.1

    word_vocab = [PAD, UNK] + word_vocab
    word_dict = {w: i for i, w in enumerate(word_vocab)}
    char_vocab = [PAD, UNK] + [c for c, n in char_counter.most_common() if n >= char_min_count]
    char_dict = {c: i for i, c in enumerate(char_vocab)}
    return word_dict, char_dict, vectors
