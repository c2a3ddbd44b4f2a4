"""Concept-graph inputs for CCA.

The reference loads pickled concept embeddings/adjacency from HARD-CODED
absolute paths AT IMPORT TIME (models/CCA.py:393-397) — a hazard this
rebuild removes: paths come from the config (the CCA.yaml already carries
adj_file/num_path/com_concept/inp_name/com_emb keys), and when the files are
absent we synthesize a deterministic concept graph of the configured size so
the model trains/tests anywhere.

``build_adjacency`` reproduces gen_A_concept (models/CCA.py:13-68):
zero diagonal, per-concept count normalization, exponential rescale,
threshold at t, commonsense block merge, 0.25 column normalization, +I.
"""

from __future__ import annotations

import os
import pickle
from typing import Tuple

import numpy as np


def rescale_adj_matrix(adj_mat: np.ndarray, t: float = 5, p: float = 0.02) -> np.ndarray:
    return np.power(t, adj_mat - p) - np.power(t, -p)


def build_adjacency(result: np.ndarray, nums: np.ndarray, com_weight: np.ndarray, t: float) -> np.ndarray:
    result = np.array(result, dtype=np.float64)
    np.fill_diagonal(result, 0)
    adj = result / nums
    adj = rescale_adj_matrix(adj)
    adj = np.where(adj < t, 0.0, 1.0)
    train_len = adj.shape[0]
    com_len = com_weight.shape[0]
    full = np.zeros((train_len + com_len, train_len + com_len), dtype=np.float64)
    full[:train_len, :train_len] = adj
    full[train_len:, :] = com_weight
    full[:, train_len:] = com_weight.T
    full = full * 0.25 / (full.sum(0, keepdims=True) + 1e-6)
    full = full + np.identity(train_len + com_len)
    return full.astype(np.float32)


def normalized_adj(adj: np.ndarray) -> np.ndarray:
    """gen_adj (models/CCA.py:43-47): D^-1/2 symmetric normalization —
    precomputed since the reference detaches it anyway."""
    d = np.power(adj.sum(1), -0.5)
    D = np.diag(d)
    return ((adj @ D).T @ D).astype(np.float32)


def load_concepts(cfg, word_dim: int = 300) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (concept_embs (A, word_dim), normalized adjacency (A, A))."""
    num_attr = int(cfg.num_attribute)

    def _exists(key):
        p = cfg.get(key)
        return p if p and os.path.exists(str(p)) else None

    inp_path = _exists("inp_name")
    com_emb_path = _exists("com_emb")
    adj_path = _exists("adj_file")
    num_path = _exists("num_path")
    com_path = _exists("com_concept")

    if inp_path and com_emb_path and adj_path and num_path and com_path:
        attr_emb = pickle.load(open(inp_path, "rb"))
        com_dict = pickle.load(open(com_emb_path, "rb"))
        com_vectors = np.array([com_dict[k] for k in com_dict.keys()])
        embs = np.concatenate([np.asarray(attr_emb), com_vectors], 0).astype(np.float32)

        result = pickle.load(open(adj_path, "rb"))
        result = result.numpy() if hasattr(result, "numpy") else np.asarray(result)
        concept_dict = pickle.load(open(num_path, "rb"))
        nums = np.array([[concept_dict[k]] for k in concept_dict.keys()], dtype=np.int32)
        com_weight = np.asarray(pickle.load(open(com_path, "rb")))
        adj = build_adjacency(result, nums, com_weight, t=0.3)
    else:
        rng = np.random.default_rng(7)
        embs = rng.standard_normal((num_attr, word_dim)).astype(np.float32) * 0.1
        raw = rng.random((num_attr, num_attr)) * 0.5
        adj = (raw + raw.T) * 0.125 + np.identity(num_attr)
        adj = adj.astype(np.float32)
    return embs, normalized_adj(adj)
