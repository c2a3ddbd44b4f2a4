"""Composition-level parity vs the ACTUAL reference ActionFormer stack:
the full ConvTransformerBackbone pyramid (reference
ActionFormerlib/backbones.py:11-163 — every block is parity-tested in
test_reference_af_ban_parity; here the ASSEMBLED stack runs end to end),
PtTransformer's label assignment (meta_archs.py:446-530) and its
pre-NMS candidate decode (meta_archs.py:641-706), against our
layers/actionformer.py + models/actionformer.py equivalents.
"""

from __future__ import annotations

from types import SimpleNamespace

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

try:
    from tests._reference import load as load_ref
    from tests.test_reference_af_ban_parity import (
        map_chan_ln, map_masked_conv, map_transformer_block, rand_mask)
except ImportError:
    from _reference import load as load_ref
    from test_reference_af_ban_parity import (
        map_chan_ln, map_masked_conv, map_transformer_block, rand_mask)

ATOL = 1e-4


@pytest.fixture(scope="module")
def ref_backbones():
    return load_ref("models.ActionFormerlib.backbones")


@pytest.fixture(scope="module")
def ref_meta():
    # meta_archs imports actionformer_utils, which imports the absent-source
    # nms_1d_cpu extension at module level; a stub satisfies the import (the
    # code under test here is pure torch)
    import sys
    import types

    sys.modules.setdefault("nms_1d_cpu", types.ModuleType("nms_1d_cpu"))
    return load_ref("models.ActionFormerlib.meta_archs")


@pytest.fixture()
def rng():
    torch.manual_seed(9)
    return np.random.default_rng(9)


def np_(t):
    return t.detach().numpy()


# ------------------------------------------- full backbone pyramid ---------

@pytest.mark.parametrize("use_abs_pe,win", [(False, (-1, -1, -1)), (True, (5, 5, -1))])
def test_conv_transformer_backbone_pyramid_vs_reference(ref_backbones, rng,
                                                        use_abs_pe, win):
    """The assembled conv-embd -> [abs-PE] -> stem -> stride-2 branch
    pyramid: per-level features AND downsampled masks, window and global
    attention variants."""
    from vmrframe_tpu.layers.actionformer import ConvTransformerBackbone

    B, C_in, C, T, H = 2, 12, 16, 32, 4
    arch = (2, 2, 2)
    ref = ref_backbones.ConvTransformerBackbone(
        n_in=C_in, n_embd=C, n_head=H, n_embd_ks=3, max_len=T, arch=arch,
        mha_win_size=list(win), scale_factor=2, with_ln=True,
        use_abs_pe=use_abs_pe).eval()

    x = rng.standard_normal((B, C_in, T)).astype(np.float32)
    mask = rand_mask(rng, B, T, min_len=T // 2)
    with torch.no_grad():
        # eval() + T < max_len keeps the reference on the same fixed PE
        # table our (training-semantics) path uses (backbones.py:133-150)
        want_feats, want_masks = ref(torch.from_numpy(x),
                                     torch.from_numpy(mask[:, None]).bool())

    ours = ConvTransformerBackbone(
        n_in=C_in, n_embd=C, n_head=H, n_embd_ks=3, max_len=T, arch=arch,
        mha_win_size=tuple(win), scale_factor=2, with_ln=True,
        use_abs_pe=use_abs_pe)
    sd = ref.state_dict()
    params = {}
    for i in range(arch[0]):
        conv = map_masked_conv(sd, f"embd.{i}")
        params[f"embd_{i}"] = conv
        params[f"embd_norm_{i}"] = map_chan_ln(sd, f"embd_norm.{i}")
    for i in range(arch[1]):
        bsd = {k[len(f"stem.{i}."):]: v for k, v in sd.items()
               if k.startswith(f"stem.{i}.")}
        params[f"stem_{i}"] = map_transformer_block(bsd)
    for i in range(arch[2]):
        bsd = {k[len(f"branch.{i}."):]: v for k, v in sd.items()
               if k.startswith(f"branch.{i}.")}
        params[f"branch_{i}"] = map_transformer_block(bsd)

    got_feats, got_masks = ours.apply(
        {"params": params}, jnp.asarray(np.transpose(x, (0, 2, 1))),
        jnp.asarray(mask), deterministic=True)
    assert len(got_feats) == len(want_feats) == arch[2] + 1
    for lvl, (gf, gm, wf, wm) in enumerate(
            zip(got_feats, got_masks, want_feats, want_masks)):
        np.testing.assert_array_equal(
            np.asarray(gm), np_(wm)[:, 0].astype(np.float32),
            err_msg=f"level {lvl} mask")
        got = np.asarray(gf) * np.asarray(gm)[..., None]
        want = np.transpose(np_(wf), (0, 2, 1)) * np_(wm)[:, 0, :, None]
        np.testing.assert_allclose(got, want, atol=ATOL,
                                   err_msg=f"level {lvl} features")


# ------------------------------------------------- label assignment --------

@pytest.mark.parametrize("center_sample", ["radius", "none"])
def test_label_points_vs_reference(ref_meta, rng, center_sample):
    """Our vectorized single-gt assignment == PtTransformer's
    label_points_single_video (called unbound with a stub self) for the VMR
    setting (one gt segment, one class)."""
    from vmrframe_tpu.config import load_config
    from vmrframe_tpu.models.actionformer import _points, label_points

    cfg = load_config("tests/configs/charades_actionformer.yaml")
    cfg = cfg.updated({"actionformer.train_cfg.center_sample": center_sample})
    af = cfg.actionformer
    points = _points(cfg)
    P = len(points)
    B = 6
    # spans in grid coords, varied lengths incl. tiny and full-range
    starts = rng.uniform(0, af.max_seq_len * 0.8, B)
    lens = rng.uniform(0.5, af.max_seq_len * 0.5, B)
    gt = np.stack([starts, starts + lens], axis=1).astype(np.float32)

    stub = SimpleNamespace(
        num_classes=1,
        train_center_sample=center_sample,
        train_center_sample_radius=float(af.train_cfg.center_sample_radius),
    )
    fn = ref_meta.PtTransformer.label_points_single_video
    tp = torch.from_numpy(points)
    want_cls, want_reg = [], []
    for b in range(B):
        c, r = fn(stub, tp, torch.from_numpy(gt[b:b + 1]),
                  torch.zeros(1, dtype=torch.long))
        want_cls.append(np_(c)[:, 0])
        want_reg.append(np_(r))
    got_cls, got_reg = label_points(jnp.asarray(points), jnp.asarray(gt), cfg)
    np.testing.assert_allclose(np.asarray(got_cls), np.stack(want_cls), atol=ATOL)
    np.testing.assert_allclose(np.asarray(got_reg), np.stack(want_reg), atol=ATOL)


# ------------------------------------------------ candidate decode ---------

def test_decode_candidates_vs_reference_inference(ref_meta, rng):
    """Our fixed-shape score-zeroing decode == inference_single_video's
    filtered candidate list (threshold + duration, topk not binding):
    same (segment, score) set."""
    from vmrframe_tpu.config import load_config
    from vmrframe_tpu.models.actionformer import _decode_candidates, _points

    cfg = load_config("tests/configs/charades_actionformer.yaml")
    points = _points(cfg)
    af = cfg.actionformer
    strides = [af.scale_factor**i
               for i in range(af.fpn_start_level, af.backbone_arch[2] + 1)]
    level_lens = [af.max_seq_len // s for s in strides]
    P = len(points)

    logits = rng.normal(size=(1, P, 1)).astype(np.float32)
    offsets = np.abs(rng.normal(size=(1, P, 2))).astype(np.float32)
    fpn_mask = np.ones((1, P), np.float32)

    stub = SimpleNamespace(
        num_classes=1,
        test_pre_nms_thresh=float(af.test_cfg.pre_nms_thresh),
        test_pre_nms_topk=10_000,  # not binding — we compare the full set
        test_duration_thresh=float(af.test_cfg.duration_thresh),
    )
    # split per level for the reference API
    splits = np.cumsum(level_lens)[:-1]
    pts_l = [torch.from_numpy(p) for p in np.split(points, splits)]
    cls_l = [torch.from_numpy(c) for c in np.split(logits[0], splits)]
    off_l = [torch.from_numpy(o) for o in np.split(offsets[0], splits)]
    msk_l = [torch.from_numpy(m).bool() for m in np.split(fpn_mask[0], splits)]
    want = ref_meta.PtTransformer.inference_single_video(
        stub, pts_l, msk_l, cls_l, off_l)
    want_set = sorted(zip(np_(want["scores"]).round(5),
                          np_(want["segments"])[:, 0].round(4),
                          np_(want["segments"])[:, 1].round(4)))

    outputs = {"cls_logits": jnp.asarray(logits), "offsets": jnp.asarray(offsets),
               "fpn_mask": jnp.asarray(fpn_mask)}
    segs, scores, _ = _decode_candidates(outputs, cfg)
    segs, scores = np.asarray(segs)[0], np.asarray(scores)[0]
    keep = scores > 0
    got_set = sorted(zip(scores[keep].round(5), segs[keep, 0].round(4),
                         segs[keep, 1].round(4)))
    assert len(got_set) == len(want_set)
    np.testing.assert_allclose(np.asarray(got_set), np.asarray(want_set),
                               atol=1e-4)
