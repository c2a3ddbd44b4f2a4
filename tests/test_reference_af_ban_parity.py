"""Numerical parity vs the ACTUAL reference modules: ActionFormerlib blocks
(incl. the Longformer-style LocalMaskedMHCA with its as_strided chunk
machinery, reference blocks.py:309-641) and BANlib's 2D-map builders +
proposal sampling (reference BANlib/model.py:226-435).

Same philosophy as tests/test_reference_modules_parity.py: real torch
modules from /root/reference, weights mapped into our trees, ≤1e-4.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

try:
    from tests._reference import load as load_ref
except ImportError:
    from _reference import load as load_ref

ATOL = 1e-4


@pytest.fixture(scope="module")
def ref_blocks():
    return load_ref("models.ActionFormerlib.blocks")


@pytest.fixture(scope="module")
def ref_ban():
    return load_ref("models.BANlib.model")


@pytest.fixture()
def rng():
    torch.manual_seed(3)
    return np.random.default_rng(3)


def np_(t):
    return t.detach().numpy()


# ------------------------------------------------------- weight mapping ---

def map_masked_conv(sd, prefix):
    """torch MaskedConv1D (Cout, Cin/groups, k) -> flax conv kernel (k, g, Cout)."""
    out = {"conv": {"kernel": np.transpose(np_(sd[f"{prefix}.conv.weight"]), (2, 1, 0))}}
    if f"{prefix}.conv.bias" in sd:
        out["conv"]["bias"] = np_(sd[f"{prefix}.conv.bias"])
    return out


def map_chan_ln(sd, prefix):
    return {"weight": np_(sd[f"{prefix}.weight"]).reshape(-1),
            "bias": np_(sd[f"{prefix}.bias"]).reshape(-1)}


def map_conv1x1(sd, prefix):
    w = np_(sd[f"{prefix}.weight"])  # (out, in, 1)
    return {"kernel": w[:, :, 0].T, "bias": np_(sd[f"{prefix}.bias"])}


def map_mhca(sd, prefix="", use_rel_pe=False):
    p = (prefix + ".") if prefix else ""
    params = {}
    for nm in ("query", "key", "value"):
        params[f"{nm}_conv"] = map_masked_conv(sd, f"{p}{nm}_conv")
        params[f"{nm}_norm"] = map_chan_ln(sd, f"{p}{nm}_norm")
        params[nm] = map_conv1x1(sd, f"{p}{nm}")
    params["proj"] = map_conv1x1(sd, f"{p}proj")
    if use_rel_pe:
        params["rel_pe"] = np_(sd[f"{p}rel_pe"])[0, 0]  # (1,1,H,W) -> (H,W)
    return params


def map_transformer_block(sd, use_rel_pe=False):
    params = {
        "ln1": map_chan_ln(sd, "ln1"),
        "ln2": map_chan_ln(sd, "ln2"),
        "attn": map_mhca(sd, "attn", use_rel_pe=use_rel_pe),
        "mlp_fc1": map_conv1x1(sd, "mlp.0"),
        "mlp_fc2": map_conv1x1(sd, "mlp.3"),
    }
    if "drop_path_attn.scale" in sd:
        params["drop_path_attn"] = {"scale": np_(sd["drop_path_attn.scale"]).transpose(0, 2, 1)}
        params["drop_path_mlp"] = {"scale": np_(sd["drop_path_mlp.scale"]).transpose(0, 2, 1)}
    return params


def rand_mask(rng, B, T, min_len=4):
    lens = rng.integers(min_len, T + 1, size=B)
    lens[0] = T
    return (np.arange(T)[None, :] < lens[:, None]).astype(np.float32)


# --------------------------------------------------- ActionFormer blocks ---

def test_channel_layernorm_vs_reference(ref_blocks, rng):
    from vmrframe_tpu.layers.actionformer import ChannelLayerNorm

    B, C, T = 2, 8, 12
    ref = ref_blocks.LayerNorm(C).eval()
    with torch.no_grad():
        ref.weight.copy_(torch.randn_like(ref.weight))
        ref.bias.copy_(torch.randn_like(ref.bias))
    params = {"weight": np_(ref.weight).reshape(-1), "bias": np_(ref.bias).reshape(-1)}
    x = rng.normal(size=(B, T, C)).astype(np.float32)
    ours = ChannelLayerNorm().apply({"params": params}, jnp.asarray(x))
    theirs = ref(torch.tensor(x).transpose(1, 2)).transpose(1, 2)
    np.testing.assert_allclose(np.asarray(ours), np_(theirs), atol=ATOL)


@pytest.mark.parametrize("stride", [1, 2])
def test_masked_conv1d_vs_reference(ref_blocks, rng, stride):
    from vmrframe_tpu.layers.actionformer import MaskedConv1D

    B, T, Cin, Cout, k = 2, 16, 6, 10, 3
    ref = ref_blocks.MaskedConv1D(Cin, Cout, k, stride=stride, padding=k // 2).eval()
    params = {"conv": {"kernel": np.transpose(np_(ref.conv.weight), (2, 1, 0)),
                       "bias": np_(ref.conv.bias)}}
    x = rng.normal(size=(B, T, Cin)).astype(np.float32)
    mask = rand_mask(rng, B, T)
    ours, omask = MaskedConv1D(Cout, k, stride).apply(
        {"params": params}, jnp.asarray(x), jnp.asarray(mask))
    ty, tmask = ref(torch.tensor(x).transpose(1, 2), torch.tensor(mask).unsqueeze(1).bool())
    np.testing.assert_allclose(np.asarray(omask), np_(tmask.squeeze(1).float()), atol=0)
    np.testing.assert_allclose(np.asarray(ours), np_(ty.transpose(1, 2)), atol=ATOL)


@pytest.mark.parametrize("stride", [1, 2])
def test_masked_mhca_vs_reference(ref_blocks, rng, stride):
    from vmrframe_tpu.layers.actionformer import MaskedMHCA

    B, T, C, H = 2, 16, 8, 2
    ref = ref_blocks.MaskedMHCA(C, H, n_qx_stride=stride, n_kv_stride=stride).eval()
    params = map_mhca(ref.state_dict())
    x = rng.normal(size=(B, T, C)).astype(np.float32)
    mask = rand_mask(rng, B, T)
    ours, omask = MaskedMHCA(C, H, n_qx_stride=stride, n_kv_stride=stride).apply(
        {"params": params}, jnp.asarray(x), jnp.asarray(mask))
    ty, tmask = ref(torch.tensor(x).transpose(1, 2), torch.tensor(mask).unsqueeze(1).bool())
    np.testing.assert_allclose(np.asarray(omask), np_(tmask.squeeze(1).float()), atol=0)
    np.testing.assert_allclose(np.asarray(ours), np_(ty.transpose(1, 2)), atol=ATOL)


@pytest.mark.parametrize("window,stride,rel_pe", [(5, 1, False), (5, 1, True),
                                                  (9, 1, True), (5, 2, False)])
def test_local_masked_mhca_vs_reference(ref_blocks, rng, window, stride, rel_pe):
    """Our band-mask formulation vs the real as_strided chunk machinery."""
    from vmrframe_tpu.layers.actionformer import MaskedMHCA

    B, T, C, H = 2, 16, 8, 2
    ref = ref_blocks.LocalMaskedMHCA(C, H, window_size=window, n_qx_stride=stride,
                                     n_kv_stride=stride, use_rel_pe=rel_pe).eval()
    if rel_pe:
        with torch.no_grad():
            ref.rel_pe.copy_(0.5 * torch.randn_like(ref.rel_pe))
    params = map_mhca(ref.state_dict(), use_rel_pe=rel_pe)
    x = rng.normal(size=(B, T, C)).astype(np.float32)
    mask = rand_mask(rng, B, T)
    ours, omask = MaskedMHCA(C, H, n_qx_stride=stride, n_kv_stride=stride,
                             window_size=window, use_rel_pe=rel_pe).apply(
        {"params": params}, jnp.asarray(x), jnp.asarray(mask))
    ty, tmask = ref(torch.tensor(x).transpose(1, 2), torch.tensor(mask).unsqueeze(1).bool())
    np.testing.assert_allclose(np.asarray(omask), np_(tmask.squeeze(1).float()), atol=0)
    np.testing.assert_allclose(np.asarray(ours), np_(ty.transpose(1, 2)), atol=ATOL)


@pytest.mark.parametrize("ds,window", [(1, -1), (2, -1), (1, 5)])
def test_transformer_block_vs_reference(ref_blocks, rng, ds, window):
    from vmrframe_tpu.layers.actionformer import TransformerBlock

    B, T, C, H = 2, 16, 8, 2
    ref = ref_blocks.TransformerBlock(C, H, n_ds_strides=(ds, ds), path_pdrop=0.1,
                                      mha_win_size=window).eval()
    params = map_transformer_block(ref.state_dict())
    x = rng.normal(size=(B, T, C)).astype(np.float32)
    mask = rand_mask(rng, B, T)
    ours, omask = TransformerBlock(C, H, n_ds_stride=ds, path_pdrop=0.1,
                                   mha_win_size=window).apply(
        {"params": params}, jnp.asarray(x), jnp.asarray(mask))
    ty, tmask = ref(torch.tensor(x).transpose(1, 2), torch.tensor(mask).unsqueeze(1).bool())
    np.testing.assert_allclose(np.asarray(omask), np_(tmask.squeeze(1).float()), atol=0)
    np.testing.assert_allclose(np.asarray(ours), np_(ty.transpose(1, 2)), atol=ATOL)


def test_conv_block_vs_reference(ref_blocks, rng):
    from vmrframe_tpu.layers.actionformer import ConvBlock

    B, T, C = 2, 16, 8
    ref = ref_blocks.ConvBlock(C, kernel_size=3, n_ds_stride=2).eval()
    sd = ref.state_dict()
    params = {"conv1": map_masked_conv(sd, "conv1"), "conv2": map_masked_conv(sd, "conv2"),
              "downsample": map_masked_conv(sd, "downsample")}
    x = rng.normal(size=(B, T, C)).astype(np.float32)
    mask = rand_mask(rng, B, T)
    ours, omask = ConvBlock(C, 3, 2).apply({"params": params}, jnp.asarray(x), jnp.asarray(mask))
    ty, tmask = ref(torch.tensor(x).transpose(1, 2), torch.tensor(mask).unsqueeze(1).bool())
    np.testing.assert_allclose(np.asarray(omask), np_(tmask.squeeze(1).float()), atol=0)
    np.testing.assert_allclose(np.asarray(ours), np_(ty.transpose(1, 2)), atol=ATOL)


def test_sinusoid_encoding_vs_reference(ref_blocks):
    from vmrframe_tpu.layers.actionformer import get_sinusoid_encoding

    ours = get_sinusoid_encoding(32, 16)  # (T, C)
    theirs = ref_blocks.get_sinusoid_encoding(32, 16)  # (1, C, T)
    np.testing.assert_allclose(ours, np_(theirs)[0].T, atol=1e-5)


def test_af_losses_vs_reference(rng):
    ref_losses = load_ref("models.ActionFormerlib.losses")
    from vmrframe_tpu.models.actionformer import ctr_diou_loss_1d, sigmoid_focal_loss

    logits = rng.normal(size=(40,)).astype(np.float32)
    targets = (rng.random(40) > 0.7).astype(np.float32)
    ours = sigmoid_focal_loss(jnp.asarray(logits), jnp.asarray(targets))
    theirs = ref_losses.sigmoid_focal_loss(torch.tensor(logits), torch.tensor(targets))
    np.testing.assert_allclose(np.asarray(ours), np_(theirs), atol=ATOL)

    pred = rng.random(size=(20, 2)).astype(np.float32) * 5
    gt = rng.random(size=(20, 2)).astype(np.float32) * 5
    ours_d = ctr_diou_loss_1d(jnp.asarray(pred), jnp.asarray(gt))
    theirs_d = ref_losses.ctr_diou_loss_1d(torch.tensor(pred), torch.tensor(gt))
    np.testing.assert_allclose(np.asarray(ours_d), np_(theirs_d), atol=ATOL)


# --------------------------------------------------------------- BANlib ---

def test_sparse_max_pool_vs_reference(ref_ban, rng):
    from vmrframe_tpu.models.ban import _mask_meta, segment_max_map

    B, D, N = 2, 6, 16
    counts = [3, 2]
    ref = ref_ban.SparseMaxPool(counts, N).eval()
    x = rng.normal(size=(B, N, D)).astype(np.float32)
    tmap, tmask = ref(torch.tensor(x).transpose(1, 2))  # (B, D, N, N), (N, N)

    mask_np, offsets, _, _ = _mask_meta(counts, N)
    ours = segment_max_map(jnp.asarray(x), list(offsets))  # (B, N, N, D)
    ours = ours * jnp.asarray(mask_np)[None, :, :, None]

    np.testing.assert_array_equal(mask_np, np_(ref.mask2d.float()))
    theirs = np_(tmap).transpose(0, 2, 3, 1) * mask_np[None, :, :, None]
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=ATOL)


def test_dense_max_pool_vs_reference(ref_ban, rng):
    from vmrframe_tpu.models.ban import segment_max_map

    B, D, N = 2, 4, 12
    ref = ref_ban.DenseMaxPool(N).eval()
    x = rng.normal(size=(B, N, D)).astype(np.float32)
    tmap, tmask = ref(torch.tensor(x).transpose(1, 2))
    ours = segment_max_map(jnp.asarray(x), list(range(1, N)))
    mask = np_(tmask.float())
    np.testing.assert_allclose(np.asarray(ours) * mask[None, :, :, None],
                               np_(tmap).transpose(0, 2, 3, 1) * mask[None, :, :, None],
                               atol=ATOL)


def test_sparse_boundary_cat_vs_reference(ref_ban, rng):
    """Our boundary-cat is decomposed into gathers/matmuls; verify the
    diagonal enumeration (mask2d + cell lists) reproduces the reference's
    concat map cell-for-cell."""
    from vmrframe_tpu.models.ban import _mask_meta

    B, D, N = 2, 4, 16
    counts = [3, 2]
    ref = ref_ban.SparseBoundaryCat(counts, N)
    start = rng.normal(size=(B, D, N)).astype(np.float32)
    end = rng.normal(size=(B, D, N)).astype(np.float32)
    tmap, tmask = ref(torch.tensor(start), torch.tensor(end))  # (B, 2D, N, N)

    mask_np, _, ii, jj = _mask_meta(counts, N)
    np.testing.assert_array_equal(mask_np, np_(tmask.float()))
    # cell (i, j) = [start[:, i], end[:, j]] — the gather our matmul split uses
    ours_cells = np.concatenate([start[:, :, ii], end[:, :, jj]], axis=1)  # (B, 2D, K)
    theirs_cells = np_(tmap)[:, :, ii, jj]
    np.testing.assert_allclose(ours_cells, theirs_cells, atol=0)


def test_ban_cqattention_vs_reference(ref_ban, rng):
    from vmrframe_tpu.models.ban import BANCQAttention

    B, Lc, Lq, D = 2, 12, 6, 16
    ref = ref_ban.CQAttention(D, dropout=0.1).eval()
    sd = ref.state_dict()
    params = {"w4C": np_(sd["w4C"]), "w4Q": np_(sd["w4Q"]),
              "w4mlu": np_(sd["w4mlu"]), "bias": np_(sd["bias"])}
    C = rng.normal(size=(B, Lc, D)).astype(np.float32)
    Q = rng.normal(size=(B, Lq, D)).astype(np.float32)
    qmask = rand_mask(rng, B, Lq, min_len=2)
    ours = BANCQAttention(D, dropout=0.1).apply(
        {"params": params}, jnp.asarray(C), jnp.asarray(Q), jnp.asarray(qmask), True)
    theirs = ref(torch.tensor(C), torch.tensor(Q), torch.tensor(qmask))
    np.testing.assert_allclose(np.asarray(ours), np_(theirs), atol=ATOL)


def test_temporal_difference_vs_reference(ref_ban, rng):
    from types import SimpleNamespace

    from vmrframe_tpu.models.ban import TemporalDifference

    B, T, D = 2, 10, 8
    cfg = SimpleNamespace(model=SimpleNamespace(fuse_dim=D, droprate=0.1))
    ref = ref_ban.TemporalDifference(cfg, layer_num=2).eval()
    sd = ref.state_dict()
    params = {}
    for stream in ("feature_transform_b", "feature_transform_c"):
        sub = {}
        for k, v in sd.items():
            if k.startswith(stream + "."):
                leaf = k[len(stream) + 1:]
                leaf = leaf.replace("weight_", "w_").replace("bias_", "b_")
                sub[leaf] = np_(v)
        params[stream] = sub
    for proj in ("feature_proj_b", "feature_proj_c"):
        params[proj] = {"kernel": np_(sd[f"{proj}.0.weight"]).T,
                        "bias": np_(sd[f"{proj}.0.bias"])}

    x = rng.normal(size=(B, T, D)).astype(np.float32)
    hb, hc, td = TemporalDifference(D, 0.1, layer_num=2).apply(
        {"params": params}, jnp.asarray(x), True)
    out = ref(torch.tensor(x))
    np.testing.assert_allclose(np.asarray(hb), np_(out["feature"][0]), atol=ATOL)
    np.testing.assert_allclose(np.asarray(hc), np_(out["feature"][1]), atol=ATOL)
    np.testing.assert_allclose(np.asarray(td), np_(out["td"]), atol=ATOL, rtol=1e-4)


def test_proposal_selection_vs_reference(ref_ban, rng):
    """Our fixed-shape scan vs the data-dependent python loop
    (BANlib/model.py:371-401): same multiset of selected proposals."""
    from vmrframe_tpu.models.ban import proposal_selection

    N = 16
    counts = [3, 2]
    from vmrframe_tpu.models.ban import _mask_meta

    _, _, ii, jj = _mask_meta(counts, N)
    K = len(ii)
    moments = np.stack([ii, jj + 1], axis=1).astype(np.float32)
    scores = rng.random(K).astype(np.float32)
    topk, neighbor, negative, thresh = 3, 4, 5, 0.5

    theirs = ref_ban.proposal_selection_with_negative(
        torch.tensor(moments), torch.tensor(scores),
        thresh=thresh, topk=topk, neighbor=neighbor, negative=negative)
    idx = proposal_selection(jnp.asarray(scores), jnp.asarray(moments),
                             topk, neighbor, negative, thresh)
    ours = np.asarray(moments)[np.asarray(idx)]

    # multiset comparison (order differs by construction)
    ours_sorted = np.array(sorted(map(tuple, ours.tolist())))
    theirs_sorted = np.array(sorted(map(tuple, np_(theirs).tolist())))
    assert ours_sorted.shape == theirs_sorted.shape, (ours_sorted.shape, theirs_sorted.shape)
    np.testing.assert_allclose(ours_sorted, theirs_sorted, atol=0)


def test_seg_voting_vs_reference(rng):
    """Our on-device seg_voting vs the real reference implementation
    (actionformer_utils.py:67-101).  The reference module imports the
    absent-source nms_1d_cpu extension at module level; a stub module
    satisfies the import (seg_voting itself is pure torch)."""
    import sys
    import types

    sys.modules.setdefault("nms_1d_cpu", types.ModuleType("nms_1d_cpu"))
    ref_utils = load_ref("models.ActionFormerlib.actionformer_utils")
    from vmrframe_tpu.ops.nms import seg_voting

    N, K = 40, 6
    starts = rng.random(N).astype(np.float32) * 50
    lengths = rng.random(N).astype(np.float32) * 20 + 1
    all_segs = np.stack([starts, starts + lengths], axis=1)
    all_scores = rng.random(N).astype(np.float32)
    nms_segs = all_segs[np.argsort(-all_scores)[:K]]

    ours = seg_voting(jnp.asarray(nms_segs), jnp.asarray(all_segs),
                      jnp.asarray(all_scores), 0.5)
    theirs = ref_utils.seg_voting(torch.tensor(nms_segs), torch.tensor(all_segs),
                                  torch.tensor(all_scores), 0.5)
    np.testing.assert_allclose(np.asarray(ours), np_(theirs), atol=1e-4)
