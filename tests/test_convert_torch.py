"""Checkpoint converter: torch layouts -> flax layouts, rule by rule."""

import numpy as np
import pytest

from vmrframe_tpu.tools.convert_torch import compare_trees, convert_seqpan_family, flatten_tree


def test_conv1d_and_linear_layouts():
    sd = {
        "video_affine.video_conv1d.conv1d.weight": np.zeros((16, 32, 1), np.float32),
        "video_affine.video_conv1d.conv1d.bias": np.zeros((16,), np.float32),
        "predictor.start_hidden.conv1d.weight": np.zeros((8, 16, 1), np.float32),
    }
    out = convert_seqpan_family(sd)
    flat = flatten_tree(out["params"])
    assert flat["video_affine/video_conv1d/kernel"].shape == (32, 16)
    assert flat["video_affine/video_conv1d/bias"].shape == (16,)
    assert flat["predictor/start_hidden/kernel"].shape == (16, 8)


def test_depthwise_and_layernorm_layouts():
    sd = {
        "vfeat_encoder.conv_block.depthwise_separable_conv.0.0.weight": np.zeros((32, 1, 7), np.float32),
        "vfeat_encoder.conv_block.depthwise_separable_conv.0.1.weight": np.zeros((32, 32, 1), np.float32),
        "vfeat_encoder.conv_block.depthwise_separable_conv.0.1.bias": np.zeros((32,), np.float32),
        "vfeat_encoder.conv_block.layer_norms.0.weight": np.ones((32,), np.float32),
        "vfeat_encoder.conv_block.layer_norms.0.bias": np.zeros((32,), np.float32),
        "text_encoder.q_layer_norm.weight": np.ones((32,), np.float32),
    }
    out = convert_seqpan_family(sd)
    flat = flatten_tree(out["params"])
    assert flat["vfeat_encoder/conv_block/depthwise_0/kernel"].shape == (7, 1, 32)
    assert flat["vfeat_encoder/conv_block/pointwise_0/kernel"].shape == (32, 32)
    assert flat["vfeat_encoder/conv_block/layer_norm_0/scale"].shape == (32,)
    assert flat["text_encoder/q_layer_norm/scale"].shape == (32,)


def test_char_conv_and_glove_and_mha():
    sd = {
        "text_encoder.char_emb.char_emb.weight": np.zeros((30, 16), np.float32),
        "text_encoder.char_emb.char_convs.2.0.weight": np.zeros((30, 16, 1, 3), np.float32),
        "text_encoder.char_emb.char_convs.2.0.bias": np.zeros((30,), np.float32),
        "text_encoder.word_emb.glove_vec": np.zeros((100, 50), np.float32),
        "text_encoder.word_emb.pad_vec": np.zeros((1, 50), np.float32),
        "text_encoder.word_emb.unk_vec": np.zeros((1, 50), np.float32),
        "predictor.feature_encoder.top_self_attention.selfattn.in_proj_weight": np.zeros((96, 32), np.float32),
        "predictor.feature_encoder.top_self_attention.selfattn.in_proj_bias": np.zeros((96,), np.float32),
        "predictor.feature_encoder.top_self_attention.selfattn.out_proj.weight": np.zeros((32, 32), np.float32),
        "predictor.feature_encoder.top_self_attention.selfattn.out_proj.bias": np.zeros((32,), np.float32),
    }
    out = convert_seqpan_family(sd)
    flat = flatten_tree(out["params"])
    consts = flatten_tree(out["constants"])
    assert flat["text_encoder/char_emb/char_table"].shape == (30, 16)
    assert flat["text_encoder/char_emb/conv_k3/kernel"].shape == (3, 16, 30)
    assert consts["text_encoder/word_emb/glove_vec"].shape == (100, 50)
    assert "pad_vec" not in str(flat.keys())
    assert flat["predictor/feature_encoder/top_self_attention/query/kernel"].shape == (32, 32)
    assert flat["predictor/feature_encoder/top_self_attention/out_proj/kernel"].shape == (32, 32)


def test_dead_tensors_dropped():
    sd = {
        "dual_attention_block_1.dual_multihead_attention.bilinear_1.dense_2.conv1d.weight":
            np.zeros((8, 8, 1), np.float32),
        "dual_attention_block_1.dual_multihead_attention.layer_norm1.weight": np.ones((8,), np.float32),
        "dual_attention_block_1.dual_multihead_attention.out_layer.conv1d.weight":
            np.zeros((8, 8, 1), np.float32),
        "dual_attention_block_1.dual_multihead_attention.bilinear_1.dense_1.conv1d.weight":
            np.zeros((8, 8, 1), np.float32),
        "dual_attention_block_1.dual_multihead_attention.bilinear_1.bias_value": np.zeros((8,), np.float32),
    }
    out = convert_seqpan_family(sd)
    flat = flatten_tree(out["params"])
    assert list(sorted(flat)) == [
        "dual_attention_block_1/dual_multihead_attention/bilinear_1/bias_value",
        "dual_attention_block_1/dual_multihead_attention/bilinear_1/dense_1/kernel",
    ]


def test_compare_trees_reports():
    a = {"x": {"k": np.zeros((2, 3))}}
    b = {"x": {"k": np.zeros((3, 2))}, "y": {"b": np.zeros(2)}}
    missing, extra, mismatched = compare_trees(a, b)
    assert missing == ["y/b"]
    assert extra == []
    assert mismatched[0][0] == "x/k"
