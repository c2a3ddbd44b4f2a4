"""Numerical parity vs the ACTUAL reference CPL code: the fairseq-style
Gaussian-weighted MultiheadAttention + TransformerDecoder
(/root/reference/models/cpl_lib.py:8-326, fairseq stubbed test-side by
tests/_reference.load_cpl), the Gaussian proposal weights
(models/model.py:176-195), and the FULL CPL forward (models/model.py:74-172
— its forward uses only video_affine, word_emb, word_fc, conv1d_cw,
fc_gauss, decoder1/2, fc_comp, start_vec; the other constructed modules are
dead in forward).  Real torch modules, weights mapped into our trees, <=1e-4.
"""

from __future__ import annotations

from types import SimpleNamespace

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

try:
    from tests._reference import load_cpl
except ImportError:
    from _reference import load_cpl

ATOL = 1e-4


@pytest.fixture(scope="module")
def ref():
    lib, model = load_cpl()
    return lib, model


@pytest.fixture()
def rng():
    torch.manual_seed(5)
    return np.random.default_rng(5)


def np_(t):
    return t.detach().numpy()


def rand_mask(rng, B, T, min_len=2):
    lens = rng.integers(min_len, T + 1, size=B)
    lens[0] = T
    return (np.arange(T)[None, :] < lens[:, None]).astype(np.float32)


def map_gauss_mha(ref_mha):
    sd = ref_mha.state_dict()
    return {
        "in_proj_weight": np_(sd["in_proj_weight"]),
        "in_proj_bias": np_(sd["in_proj_bias"]),
        "out_proj_kernel": np_(sd["out_proj.weight"]).T,
        "out_proj_bias": np_(sd["out_proj.bias"]),
    }


def map_decoder_layer(ref_layer):
    sd = ref_layer.state_dict()
    return {
        "self_attn": map_gauss_mha(ref_layer.self_attn),
        "encoder_attn": map_gauss_mha(ref_layer.encoder_attn),
        "self_ln_scale": np_(sd["self_attn_layer_norm.weight"]),
        "self_ln_bias": np_(sd["self_attn_layer_norm.bias"]),
        "enc_ln_scale": np_(sd["encoder_attn_layer_norm.weight"]),
        "enc_ln_bias": np_(sd["encoder_attn_layer_norm.bias"]),
        "final_ln_scale": np_(sd["final_layer_norm.weight"]),
        "final_ln_bias": np_(sd["final_layer_norm.bias"]),
        "fc1_kernel": np_(sd["fc1.weight"]).T,
        "fc1_bias": np_(sd["fc1.bias"]),
        "fc2_kernel": np_(sd["fc2.weight"]).T,
        "fc2_bias": np_(sd["fc2.bias"]),
    }


def map_decoder(ref_dec):
    return {f"layer_{i}": map_decoder_layer(l)
            for i, l in enumerate(ref_dec.decoder_layers)}


# ------------------------------------------------- gauss-weighted MHA ------

def test_gauss_mha_vs_reference(ref, rng):
    from vmrframe_tpu.layers.cpl_decoder import GaussMultiheadAttention

    lib, _ = ref
    B, T, E, H = 3, 10, 16, 4
    ref_mha = lib.MultiheadAttention(E, H).eval()
    x = rng.standard_normal((B, T, E)).astype(np.float32)
    pad = 1 - rand_mask(rng, B, T)
    gauss = rng.random((B, T)).astype(np.float32) + 0.05

    # reference runs Time x Batch x Channel
    tx = torch.from_numpy(np.transpose(x, (1, 0, 2)))
    with torch.no_grad():
        want, want_w = ref_mha(tx, tx, tx,
                               key_padding_mask=torch.from_numpy(pad),
                               gauss_weight=torch.from_numpy(gauss))
    want = np.transpose(np_(want), (1, 0, 2))

    ours = GaussMultiheadAttention(E, H)
    variables = {"params": map_gauss_mha(ref_mha)}
    got, got_w = ours.apply(variables, jnp.asarray(x), jnp.asarray(x), jnp.asarray(x),
                            key_padding_mask=jnp.asarray(pad),
                            gauss_weight=jnp.asarray(gauss))
    np.testing.assert_allclose(np.asarray(got), want, atol=ATOL)
    np.testing.assert_allclose(np.asarray(got_w), np_(want_w), atol=ATOL)


# --------------------------------------------------- decoder stack ---------

def test_transformer_decoder_vs_reference(ref, rng):
    """Both stages of the reference's two-stage decode: self-only (stage 1,
    src=None) and cross-attending with a source Gaussian (stage 2), causal
    future-mask on, 2 layers."""
    from vmrframe_tpu.layers.cpl_decoder import TransformerDecoder

    lib, _ = ref
    B, Tsrc, Ttgt, E, H = 2, 12, 7, 16, 4
    ref_dec = lib.TransformerDecoder(num_layers=2, d_model=E, num_heads=H).eval()
    src = rng.standard_normal((B, Tsrc, E)).astype(np.float32)
    tgt = rng.standard_normal((B, Ttgt, E)).astype(np.float32)
    src_mask = rand_mask(rng, B, Tsrc)
    tgt_mask = rand_mask(rng, B, Ttgt)
    src_gauss = rng.random((B, Tsrc)).astype(np.float32) + 0.05

    variables = {"params": map_decoder(ref_dec)}
    ours = TransformerDecoder(2, E, H)

    # stage 1: tgt-only with a target Gaussian (model.py:157)
    tgt_gauss = rng.random((B, Ttgt)).astype(np.float32) + 0.05
    with torch.no_grad():
        want, _ = ref_dec(None, None, torch.from_numpy(tgt),
                          torch.from_numpy(tgt_mask),
                          tgt_gauss_weight=torch.from_numpy(tgt_gauss))
    got, _ = ours.apply(variables, None, None, jnp.asarray(tgt),
                        jnp.asarray(tgt_mask), tgt_gauss_weight=jnp.asarray(tgt_gauss))
    np.testing.assert_allclose(np.asarray(got), np_(want), atol=ATOL)

    # stage 2: cross-attention with a source Gaussian (model.py:158)
    with torch.no_grad():
        want, want_w = ref_dec(torch.from_numpy(src), torch.from_numpy(src_mask),
                               torch.from_numpy(tgt), torch.from_numpy(tgt_mask),
                               src_gauss_weight=torch.from_numpy(src_gauss))
    got, got_w = ours.apply(variables, jnp.asarray(src), jnp.asarray(src_mask),
                            jnp.asarray(tgt), jnp.asarray(tgt_mask),
                            src_gauss_weight=jnp.asarray(src_gauss))
    np.testing.assert_allclose(np.asarray(got), np_(want), atol=ATOL)
    np.testing.assert_allclose(np.asarray(got_w), np_(want_w), atol=ATOL)


# ----------------------------------------------- gaussian proposal weights --

def test_generate_gauss_weight_vs_reference(ref, rng):
    from vmrframe_tpu.models.cpl import generate_gauss_weight

    _, model_mod = ref
    BP, L = 12, 16
    center = rng.random(BP).astype(np.float32)
    width = rng.random(BP).astype(np.float32) * 0.5 + 0.01
    vmask = rand_mask(rng, BP, L)
    # generate_gauss_weight touches no module state — call it unbound
    want = np_(model_mod.CPL.generate_gauss_weight(
        None, L, torch.from_numpy(center), torch.from_numpy(width),
        torch.from_numpy(vmask)))
    got = np.asarray(generate_gauss_weight(L, jnp.asarray(center),
                                           jnp.asarray(width), jnp.asarray(vmask)))
    np.testing.assert_allclose(got, want, atol=ATOL)


# ------------------------------------------------------- full CPL forward --

def convert_cpl_params(ref_model, variables):
    """Map the reference CPL model's state_dict into our variables tree
    (params + constants), in place; returns the tree."""
    sd = ref_model.state_dict()
    p = variables["params"]
    va = p["video_affine"]
    va["video_conv1d"]["kernel"] = np_(sd["video_affine.video_conv1d.conv1d.weight"])[:, :, 0].T
    va["video_conv1d"]["bias"] = np_(sd["video_affine.video_conv1d.conv1d.bias"])
    va["v_layer_norm"]["scale"] = np_(sd["video_affine.v_layer_norm.weight"])
    va["v_layer_norm"]["bias"] = np_(sd["video_affine.v_layer_norm.bias"])
    p["word_emb"]["unk_vec"] = np_(sd["word_emb.unk_vec"])
    variables["constants"]["word_emb"]["glove_vec"] = np_(sd["word_emb.glove_vec"])
    p["start_vec"] = np_(sd["start_vec"])
    p["word_fc_kernel"] = np_(sd["word_fc.weight"]).T
    p["word_fc_bias"] = np_(sd["word_fc.bias"])
    p["conv1d_cw_kernel"] = np_(sd["conv1d_cw.weight"])[0]  # (1, L, 1) -> (L, 1)
    p["conv1d_cw_bias"] = np_(sd["conv1d_cw.bias"])
    p["fc_gauss_kernel"] = np_(sd["fc_gauss.weight"]).T
    p["fc_gauss_bias"] = np_(sd["fc_gauss.bias"])
    p["fc_comp_kernel"] = np_(sd["fc_comp.weight"]).T
    p["fc_comp_bias"] = np_(sd["fc_comp.bias"])
    p["decoder1"] = map_decoder(ref_model.decoder1)
    p["decoder2"] = map_decoder(ref_model.decoder2)
    return variables


def test_cpl_full_model_vs_reference(ref, rng):
    from vmrframe_tpu.config import Config, Derived
    from vmrframe_tpu.models.cpl import CPL as OurCPL

    _, model_mod = ref
    B, L, T, dim, vdim, word_dim = 2, 16, 6, 32, 24, 50
    num_words, num_chars = 40, 20
    cfg_ref = SimpleNamespace(
        model=SimpleNamespace(dim=dim, vlen=L, tlen=T, vdim=vdim,
                              word_dim=word_dim, char_dim=100, num_heads=4,
                              droprate=0.0, name="CPL"),
        num_words=num_words, num_chars=num_chars, device="cpu",
    )
    word_vectors = rng.standard_normal((num_words - 2, word_dim)).astype(np.float32) * 0.1
    ref_model = model_mod.CPL(cfg_ref, torch.from_numpy(word_vectors)).eval()

    vfeats = rng.standard_normal((B, L, vdim)).astype(np.float32)
    vmask = rand_mask(rng, B, L, min_len=6)
    word_ids = rng.integers(1, num_words, (B, T)).astype(np.int64)
    n_words = rng.integers(2, T + 1, B)
    word_ids[np.arange(T)[None, :] >= n_words[:, None]] = 0
    tmask = (word_ids != 0).astype(np.float32)
    char_ids = np.zeros((B, T, 4), np.int64)  # unused by the CPL forward

    with torch.no_grad():
        want = ref_model(torch.from_numpy(word_ids), torch.from_numpy(char_ids),
                         torch.from_numpy(vfeats), torch.from_numpy(vmask),
                         torch.from_numpy(tmask))

    cfg = Config({
        "task": "charades",
        "train": {"epochs": 1, "batch_size": B, "lr": 1e-3,
                  "warmup_proportion": 0.0, "clip_norm": 1.0},
        "model": {"name": "CPL", "vlen": L, "tlen": T, "vdim": vdim, "dim": dim,
                  "num_heads": 4, "word_dim": word_dim, "char_dim": 100,
                  "droprate": 0.0},
    })
    derived = Derived(num_words=num_words, num_chars=num_chars,
                      num_train_steps=10, steps_per_epoch=10)
    ours = OurCPL(cfg=cfg, derived=derived, word_vectors=word_vectors)
    batch = {"vfeats": jnp.asarray(vfeats), "vmasks": jnp.asarray(vmask),
             "words_ids": jnp.asarray(word_ids.astype(np.int32)),
             "tmasks": jnp.asarray(tmask)}
    k = jax.random.PRNGKey(0)
    variables = ours.init({"params": k, "dropout": k}, batch, True)
    variables = jax.tree_util.tree_map(np.asarray, variables)
    variables = convert_cpl_params(ref_model, variables)

    out = ours.apply(variables, batch, True)
    for key in ("words_logit", "width", "center", "gauss_weight"):
        np.testing.assert_allclose(
            np.asarray(out[key]), np_(want[key]), atol=ATOL,
            err_msg=f"CPL output '{key}' diverges from the real reference")
    np.testing.assert_allclose(np.asarray(out["words_mask"]),
                               np_(want["words_mask"]), atol=0)
