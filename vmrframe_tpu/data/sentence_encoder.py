"""Sentence embeddings for the SBERT-dependent model variants.

The reference calls SentenceTransformer('bert-base-nli-mean-tokens').encode
per sample inside the dataset (BackBoneAlignFeature.py:83-93).  That package
and its weights may be unavailable (zero-egress environments), so this is an
optional dependency behind a factory:

1. sentence_transformers, if importable AND its weights resolve;
2. otherwise a deterministic hashed bag-of-words embedding — every word maps
   to a fixed pseudo-random vector (crc32-seeded), sentence = mean.  Not a
   semantic model, but stable, dimension-correct and collision-resistant
   enough to exercise (and smoke-train) the alignment models anywhere.

Embeddings are cached per sentence.
"""

from __future__ import annotations

import zlib
from typing import Dict

import numpy as np

_SBERT_MODEL = "bert-base-nli-mean-tokens"


class HashedBoWEncoder:
    def __init__(self, dim: int = 768):
        self.dim = dim
        self._cache: Dict[str, np.ndarray] = {}

    def encode(self, sentence: str) -> np.ndarray:
        hit = self._cache.get(sentence)
        if hit is not None:
            return hit
        words = sentence.strip().lower().split()
        if not words:
            words = ["<empty>"]
        vecs = []
        for w in words:
            rng = np.random.default_rng(zlib.crc32(w.encode()))
            vecs.append(rng.standard_normal(self.dim).astype(np.float32))
        out = np.mean(vecs, axis=0)
        self._cache[sentence] = out
        return out


class SBertEncoder:
    def __init__(self, model_name: str = _SBERT_MODEL):
        from sentence_transformers import SentenceTransformer

        self.model = SentenceTransformer(model_name)
        self._cache: Dict[str, np.ndarray] = {}

    def encode(self, sentence: str) -> np.ndarray:
        hit = self._cache.get(sentence)
        if hit is None:
            hit = np.asarray(self.model.encode(sentence, show_progress_bar=False), np.float32)
            self._cache[sentence] = hit
        return hit


def get_sentence_encoder(dim: int = 768):
    try:
        return SBertEncoder()
    except Exception:
        return HashedBoWEncoder(dim)
