"""Structural round-trip: our full SeqPAN param tree -> reference-style torch
names (inverse mapping, written here as the contract) -> convert_seqpan_family
-> must reconstruct the exact flax tree (no missing/extra/mismatched leaves)."""

import re

import jax
import numpy as np
import pytest

from vmrframe_tpu.config import Derived, load_config
from vmrframe_tpu.testing import make_synthetic_data
from vmrframe_tpu.tools.convert_torch import compare_trees, convert_seqpan_family, flatten_tree


def _to_torch_names(flat_params, flat_consts):
    """Inverse of the converter's layout rules, for test purposes."""
    sd = {}
    for key, v in flat_params.items():
        parts = key.split("/")
        name = ".".join(parts)
        leaf = parts[-1]
        if m := re.match(r"conv_k(\d)", parts[-2] if len(parts) > 1 else ""):
            base = ".".join(parts[:-2])
            idx = int(m.group(1)) - 1
            if leaf == "kernel":  # (k, cd, ch) -> (ch, cd, 1, k)
                sd[f"{base}.char_convs.{idx}.0.weight"] = v.transpose(2, 1, 0)[:, :, None, :]
            else:
                sd[f"{base}.char_convs.{idx}.0.bias"] = v
        elif len(parts) >= 2 and parts[-2].startswith("depthwise_"):
            i = parts[-2].split("_")[1]
            base = ".".join(parts[:-2])
            sd[f"{base}.depthwise_separable_conv.{i}.0.weight"] = v.transpose(2, 1, 0)
        elif len(parts) >= 2 and parts[-2].startswith("pointwise_"):
            i = parts[-2].split("_")[1]
            base = ".".join(parts[:-2])
            if leaf == "kernel":
                sd[f"{base}.depthwise_separable_conv.{i}.1.weight"] = v.T[:, :, None]
            else:
                sd[f"{base}.depthwise_separable_conv.{i}.1.bias"] = v
        elif len(parts) >= 2 and re.match(r"layer_norm_\d$", parts[-2]) and "conv_block" in parts:
            i = parts[-2].split("_")[-1]
            base = ".".join(parts[:-2])
            sd[f"{base}.layer_norms.{i}.{'weight' if leaf == 'scale' else 'bias'}"] = v
        elif "layer_norm" in (parts[-2] if len(parts) > 1 else ""):
            tname = ".".join(parts[:-1]) + ("." + ("weight" if leaf == "scale" else "bias"))
            sd[tname] = v
        elif parts[-1] == "char_table":
            sd[".".join(parts[:-1]) + ".char_emb.weight"] = v
        elif "top_self_attention" in parts:
            base = ".".join(parts[:-2]) + ".selfattn"
            which = parts[-2]
            if which in ("query", "key", "value"):
                sd.setdefault(f"{base}.__qkv__", {}).setdefault(leaf, {})[which] = v
            else:  # out_proj
                sd[f"{base}.out_proj.{'weight' if leaf == 'kernel' else 'bias'}"] = (
                    v.T if leaf == "kernel" else v)
        elif parts[-1] == "position_embeddings":
            sd[name.replace("/", ".") + ".weight"] = v
        elif leaf == "kernel":
            sd[".".join(parts[:-1]) + ".conv1d.weight"] = v.T[:, :, None]
        elif leaf == "bias" and key.replace("/bias", "/kernel") in flat_params:
            sd[".".join(parts[:-1]) + ".conv1d.bias"] = v
        else:
            sd[name.replace("/", ".")] = v

    # assemble MHA joint projections
    for base_key in [k for k in list(sd) if k.endswith(".__qkv__")]:
        parts_map = sd.pop(base_key)
        base = base_key[: -len(".__qkv__")]
        kmat = np.concatenate([parts_map["kernel"][w].T for w in ("query", "key", "value")], axis=0)
        bvec = np.concatenate([parts_map["bias"][w] for w in ("query", "key", "value")], axis=0)
        sd[base + ".in_proj_weight"] = kmat
        sd[base + ".in_proj_bias"] = bvec

    for key, v in flat_consts.items():
        sd[key.replace("/", ".")] = v
        if key.endswith("glove_vec"):
            sd[key.replace("/", ".").replace("glove_vec", "pad_vec")] = np.zeros(
                (1, v.shape[1]), np.float32)
    return sd


def test_full_seqpan_structure_roundtrip(charades_cfg):
    dataset, store = make_synthetic_data(charades_cfg, seed=0, n_train=8, n_test=4)
    derived = Derived(num_words=dataset["n_words"], num_chars=dataset["n_chars"])
    from vmrframe_tpu.registry import get_model_entry

    entry = get_model_entry("SeqPAN")
    model = entry.model_cls(cfg=charades_cfg, derived=derived,
                            word_vectors=dataset["word_vector"])
    from vmrframe_tpu.data.batcher import Batcher

    batch = Batcher(dataset["train_set"], store, charades_cfg, derived, "train").make_batch(
        list(range(8)), __import__("random").Random(0))
    example = {k: v for k, v in batch.items() if k != "num_valid"}
    rng = jax.random.PRNGKey(0)
    variables = model.init({"params": rng, "dropout": rng, "gumbel": rng}, example, True)

    flat_p = flatten_tree(jax.tree_util.tree_map(np.asarray, variables["params"]))
    flat_c = flatten_tree(jax.tree_util.tree_map(np.asarray, variables["constants"]))
    sd = _to_torch_names(flat_p, flat_c)
    converted = convert_seqpan_family(sd)

    missing, extra, mismatched = compare_trees(
        converted["params"], jax.tree_util.tree_map(np.asarray, variables["params"]))
    assert not missing, f"missing after conversion: {missing[:8]}"
    assert not extra, f"extra after conversion: {extra[:8]}"
    assert not mismatched, f"shape mismatches: {mismatched[:8]}"
    # values round-trip exactly
    conv_flat = flatten_tree(converted["params"])
    for k, v in flat_p.items():
        np.testing.assert_array_equal(conv_flat[k], v, err_msg=k)
    c_missing, c_extra, c_mm = compare_trees(
        converted["constants"], jax.tree_util.tree_map(np.asarray, variables["constants"]))
    assert not c_missing and not c_mm
