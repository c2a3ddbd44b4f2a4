"""PyTorch state_dict -> vmrframe_tpu parameter-tree converter.

Enables the ≤1e-4 per-layer parity harness against reference checkpoints
(ckpt/{task}_{suffix}/best_{model}.pkl files saved by the reference's
save_best_model, utils/utils.py:208-215).

Layout rules (torch -> flax):
- Conv1d k=1 (the reference's Conv1D Linear-alias): (out, in, 1) -> (in, out)
- depthwise Conv1d k=7: (dim, 1, 7) -> (7, 1, dim)
- Conv2d (1, k) char convs: (ch, char_dim, 1, k) -> (k, char_dim, ch)
- Linear: (out, in) -> (in, out)
- LayerNorm weight/bias -> scale/bias
- nn.MultiheadAttention in_proj_weight (3D, D) -> separate q/k/v Dense
  kernels (D, D) (the predictor's TopSelfAttention2)
- LSTM weights keep the torch (4H, D) layout (layers/recurrent.py stores
  them identically)

Dead reference tensors are dropped: BiLinear.dense_2 (models/layers.py:257-259
applies dense_1 to both inputs), DualMultiAttention.{layer_norm1,layer_norm2,
out_layer} (never called in its forward, models/layers.py:336-381).
"""

from __future__ import annotations

import re
from typing import Any, Dict, Tuple

import numpy as np


def _set(tree: Dict, path: Tuple[str, ...], value: np.ndarray):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


DEAD_PATTERNS = [
    re.compile(r"\.bilinear_\d\.dense_2\."),
    re.compile(r"dual_multihead_attention\.(layer_norm1|layer_norm2|out_layer)\."),
    re.compile(r"\.num_batches_tracked$"),
]


def convert_seqpan_family(state_dict: Dict[str, Any]) -> Dict[str, Dict]:
    """Convert a SeqPAN/BaseFast/BackBone-family torch state_dict.

    Returns {'params': tree, 'constants': tree}.
    """
    params: Dict = {}
    constants: Dict = {}

    def np_(v):
        # copy=True: torch .numpy() shares memory with the live tensor — a
        # view would silently track later in-place optimizer updates
        return np.array(getattr(v, "numpy", lambda: v)(), dtype=np.float32, copy=True)

    for name, value in state_dict.items():
        if any(p.search(name) for p in DEAD_PATTERNS):
            continue
        v = np_(value)
        parts = name.split(".")

        # --- frozen GloVe + pad row ---
        if parts[-1] == "glove_vec":
            _set(constants, tuple(parts[:-1]) + ("glove_vec",), v)
            continue
        if parts[-1] == "pad_vec":
            continue  # always zeros, reconstructed at runtime

        # --- the reference renames we normalize ---
        name = name.replace(".conv1d.weight", ".kernel").replace(".conv1d.bias", ".bias")

        # char conv stacks: char_convs.{i}.0.{weight,bias} -> conv_k{i+1}
        m = re.search(r"char_emb\.char_convs\.(\d)\.0\.(weight|bias)", name)
        if m:
            k = int(m.group(1)) + 1
            base = tuple((name[: m.start()] + "char_emb").split("."))
            if m.group(2) == "weight":  # (ch, char_dim, 1, k) -> (k, char_dim, ch)
                _set(params, base + (f"conv_k{k}", "kernel"), v.squeeze(2).transpose(2, 1, 0))
            else:
                _set(params, base + (f"conv_k{k}", "bias"), v)
            continue
        if name.endswith("char_emb.char_emb.weight"):
            base = tuple(name.split(".")[:-2])
            _set(params, base + ("char_table",), v)
            continue

        # depthwise-separable conv blocks
        m = re.search(r"conv_block\.depthwise_separable_conv\.(\d)\.([01])\.(weight|bias)", name)
        if m:
            i, which, wb = int(m.group(1)), m.group(2), m.group(3)
            base = tuple(name[: m.start()].split(".")[:-1]) + ("conv_block",)
            if which == "0":  # depthwise (dim, 1, 7) -> kernel (7, 1, dim)
                _set(params, base + (f"depthwise_{i}", "kernel"), v.transpose(2, 1, 0))
            else:  # pointwise (dim, dim, 1)
                if wb == "weight":
                    _set(params, base + (f"pointwise_{i}", "kernel"), v.squeeze(2).T)
                else:
                    _set(params, base + (f"pointwise_{i}", "bias"), v)
            continue
        m = re.search(r"conv_block\.layer_norms\.(\d)\.(weight|bias)", name)
        if m:
            i, wb = int(m.group(1)), m.group(2)
            base = tuple(name[: m.start()].split(".")[:-1]) + ("conv_block",)
            _set(params, base + (f"layer_norm_{i}", "scale" if wb == "weight" else "bias"), v)
            continue

        # positional embeddings
        if name.endswith("pos_embedding.position_embeddings.weight"):
            _set(params, tuple(name.split(".")[:-1]), v)
            continue

        # predictor MultiheadAttention (TopSelfAttention2)
        m = re.search(r"top_self_attention\.selfattn\.(.*)", name)
        if m:
            base = tuple(name[: m.start()].split(".")[:-1]) + ("top_self_attention",)
            sub = m.group(1)
            D = v.shape[-1] if v.ndim > 1 else v.shape[0] // 3
            if sub == "in_proj_weight":
                q, k_, vv = np.split(v, 3, axis=0)
                for nm, mat in (("query", q), ("key", k_), ("value", vv)):
                    _set(params, base + (nm, "kernel"), mat.T)
            elif sub == "in_proj_bias":
                q, k_, vv = np.split(v, 3, axis=0)
                for nm, bias in (("query", q), ("key", k_), ("value", vv)):
                    _set(params, base + (nm, "bias"), bias)
            elif sub == "out_proj.weight":
                _set(params, base + ("out_proj", "kernel"), v.T)
            elif sub == "out_proj.bias":
                _set(params, base + ("out_proj", "bias"), v)
            continue

        # LSTM weights: torch names weight_ih_l{k}[_reverse] -> our
        # w_ih_l{k}[_reverse]; layouts are identical (layers/recurrent.py)
        m = re.search(r"\.(weight|bias)_(ih|hh)_l(\d+)(_reverse)?$", name)
        if m:
            w, which, layer, rev = m.groups()
            leaf = f"{'w' if w == 'weight' else 'b'}_{which}_l{layer}{rev or ''}"
            _set(params, tuple(name[: m.start()].split(".")) + (leaf,), v)
            continue

        parts = name.split(".")
        # generic LayerNorm: ...layer_norm*.weight/bias -> scale/bias
        if len(parts) >= 2 and "layer_norm" in parts[-2] and parts[-1] in ("weight", "bias"):
            leaf = "scale" if parts[-1] == "weight" else "bias"
            _set(params, tuple(parts[:-1]) + (leaf,), v)
            continue
        # already-normalized Conv1D kernels: (out, in, 1) -> (in, out)
        if parts[-1] == "kernel":
            if v.ndim == 3 and v.shape[-1] == 1:
                v = v.squeeze(2).T
            elif v.ndim == 2:
                v = v.T
            _set(params, tuple(parts), v)
            continue
        # raw (dim, 1) attention-pool weights stay as-is (WeightedPool,
        # models/layers.py:440-453)
        if len(parts) >= 2 and parts[-2] == "weighted_pool":
            _set(params, tuple(parts), v)
            continue
        # plain Linear
        if parts[-1] == "weight" and v.ndim == 2:
            _set(params, tuple(parts[:-1]) + ("kernel",), v.T)
            continue
        # everything else (biases, label_embs, w4C/w4Q/w4mlu, bias_value,
        # unk_vec, LSTM mats already in torch layout)
        _set(params, tuple(parts), v)

    return {"params": params, "constants": constants}


def load_torch_checkpoint(path: str) -> Dict[str, Any]:
    import torch

    return torch.load(path, map_location="cpu")


def flatten_tree(tree: Dict, prefix: str = "") -> Dict[str, np.ndarray]:
    out = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.update(flatten_tree(v, key))
        else:
            out[key] = np.asarray(v)
    return out


def compare_trees(converted: Dict, target: Dict, atol: float = 1e-4):
    """Per-leaf comparison report: (missing_in_converted, extra, mismatched)."""
    a, b = flatten_tree(converted), flatten_tree(target)
    missing = sorted(set(b) - set(a))
    extra = sorted(set(a) - set(b))
    mismatched = []
    for key in sorted(set(a) & set(b)):
        if a[key].shape != b[key].shape:
            mismatched.append((key, a[key].shape, b[key].shape))
    return missing, extra, mismatched
