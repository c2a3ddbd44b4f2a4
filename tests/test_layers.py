import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vmrframe_tpu.layers import (
    CQAttention,
    CQConcatenate,
    DualAttentionBlock,
    Embedding,
    FeatureEncoder,
    SeqPANPredictor,
    VisualProjection,
)
from vmrframe_tpu.layers.basic import Conv1D, LayerNorm
from vmrframe_tpu.ops.masking import length_to_mask, mask_logits
from vmrframe_tpu.ops.span import infer_span_1d


def test_conv1d_is_dense():
    x = np.random.default_rng(0).standard_normal((2, 5, 8)).astype(np.float32)
    mod = Conv1D(4)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    y = mod.apply(params, jnp.asarray(x))
    kernel = np.asarray(params["params"]["kernel"])
    bias = np.asarray(params["params"]["bias"])
    np.testing.assert_allclose(np.asarray(y), x @ kernel + bias, atol=1e-5)


def test_layer_norm_matches_torch():
    torch = pytest.importorskip("torch")
    x = np.random.default_rng(0).standard_normal((2, 5, 8)).astype(np.float32)
    mod = LayerNorm()
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    got = np.asarray(mod.apply(params, jnp.asarray(x)))
    want = torch.nn.LayerNorm(8, eps=1e-6)(torch.tensor(x)).detach().numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_mask_logits_and_length_mask():
    mask = length_to_mask(jnp.asarray([2, 4]), 4)
    np.testing.assert_array_equal(np.asarray(mask), [[1, 1, 0, 0], [1, 1, 1, 1]])
    logits = jnp.zeros((2, 4))
    masked = mask_logits(logits, mask)
    assert float(masked[0, 3]) < -1e29
    assert float(masked[0, 0]) == 0.0


def test_infer_span_ordering():
    # start must never come after end (triu restriction)
    B, L = 4, 16
    rng = np.random.default_rng(0)
    slog = rng.standard_normal((B, L)).astype(np.float32) * 3
    elog = rng.standard_normal((B, L)).astype(np.float32) * 3
    vmask = np.ones((B, L), np.float32)
    out = np.asarray(infer_span_1d(jnp.asarray(slog), jnp.asarray(elog), jnp.asarray(vmask)))
    assert np.all(out[:, 0] <= out[:, 1])
    assert np.all(out >= 0) and np.all(out <= 1)


def test_infer_span_respects_vmask_denominator():
    B, L = 1, 8
    slog = np.zeros((B, L), np.float32)
    elog = np.zeros((B, L), np.float32)
    slog[0, 2] = 10.0
    elog[0, 3] = 10.0
    vmask = np.zeros((B, L), np.float32)
    vmask[0, :4] = 1.0
    out = np.asarray(infer_span_1d(jnp.asarray(slog), jnp.asarray(elog), jnp.asarray(vmask)))
    # fractions divide by vmask.sum()=4, not L=8 (reference engine.py:41-42)
    assert out[0, 0] == pytest.approx(2 / 4)
    assert out[0, 1] == pytest.approx(3 / 4)


@pytest.mark.parametrize("mod,args", [
    (VisualProjection(dim=16), lambda r: (r.standard_normal((2, 12, 32)).astype(np.float32),)),
])
def test_visual_projection_shape(mod, args):
    rng = np.random.default_rng(0)
    inputs = tuple(jnp.asarray(a) for a in args(rng))
    params = mod.init(jax.random.PRNGKey(0), *inputs)
    out = mod.apply(params, *inputs)
    assert out.shape == (2, 12, 16)


def test_feature_encoder_shape_and_masking_stability():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 12, 16)).astype(np.float32))
    mod = FeatureEncoder(dim=16, max_pos_len=12)
    params = mod.init(jax.random.PRNGKey(0), x)
    out = mod.apply(params, x)
    assert out.shape == (2, 12, 16)
    assert np.all(np.isfinite(np.asarray(out)))


def test_embedding_uses_frozen_glove_constants():
    rng = np.random.default_rng(0)
    wv = rng.standard_normal((20, 24)).astype(np.float32)
    mod = Embedding(out_dim=16, word_dim=24, char_dim=8, num_chars=30, word_vectors=wv)
    wid = jnp.asarray(rng.integers(0, 22, (2, 6)), jnp.int32)
    cid = jnp.asarray(rng.integers(0, 30, (2, 6, 5)), jnp.int32)
    variables = mod.init(jax.random.PRNGKey(0), wid, cid)
    assert "constants" in variables  # glove not trainable
    glove = variables["constants"]["word_emb"]["glove_vec"]
    np.testing.assert_allclose(np.asarray(glove), wv)
    out = mod.apply(variables, wid, cid)
    assert out.shape == (2, 6, 16)


def test_dual_attention_block_mask_invariance():
    """Masked-out 'to' positions must not influence the output."""
    rng = np.random.default_rng(0)
    B, Lf, Lt, D = 2, 8, 6, 16
    from_t = jnp.asarray(rng.standard_normal((B, Lf, D)).astype(np.float32))
    to_t = np.asarray(rng.standard_normal((B, Lt, D)).astype(np.float32))
    from_mask = jnp.ones((B, Lf))
    to_mask = np.ones((B, Lt), np.float32)
    to_mask[:, 4:] = 0.0

    mod = DualAttentionBlock(dim=D, num_heads=4)
    params = mod.init(jax.random.PRNGKey(0), from_t, jnp.asarray(to_t), from_mask, jnp.asarray(to_mask))
    out1 = mod.apply(params, from_t, jnp.asarray(to_t), from_mask, jnp.asarray(to_mask))
    # perturb masked positions: output must be identical
    to_t2 = to_t.copy()
    to_t2[:, 4:] += 100.0
    out2 = mod.apply(params, from_t, jnp.asarray(to_t2), from_mask, jnp.asarray(to_mask))
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-4)


def test_cqattention_and_concat_shapes():
    rng = np.random.default_rng(0)
    B, Lc, Lq, D = 2, 10, 6, 16
    ctx = jnp.asarray(rng.standard_normal((B, Lc, D)).astype(np.float32))
    qry = jnp.asarray(rng.standard_normal((B, Lq, D)).astype(np.float32))
    c_mask = jnp.ones((B, Lc))
    q_mask = jnp.ones((B, Lq))
    cqa = CQAttention(dim=D)
    params = cqa.init(jax.random.PRNGKey(0), ctx, qry, c_mask, q_mask)
    fused = cqa.apply(params, ctx, qry, c_mask, q_mask)
    assert fused.shape == (B, Lc, D)
    cat = CQConcatenate(dim=D)
    params2 = cat.init(jax.random.PRNGKey(1), fused, qry, q_mask)
    out = cat.apply(params2, fused, qry, q_mask)
    assert out.shape == (B, Lc, D)


def test_seqpan_predictor_shapes():
    rng = np.random.default_rng(0)
    B, L, D = 2, 12, 16
    x = jnp.asarray(rng.standard_normal((B, L, D)).astype(np.float32))
    mask = jnp.ones((B, L))
    mod = SeqPANPredictor(dim=D, max_pos_len=L)
    params = mod.init(jax.random.PRNGKey(0), x, mask)
    s, e = mod.apply(params, x, mask)
    assert s.shape == (B, L) and e.shape == (B, L)


def test_depthwise_shift_matches_conv_fwd_and_grad():
    """DepthwiseConv1D impl="shift" (k shifted multiply-adds) vs the grouped
    conv lowering: same params, same outputs and grads to 1e-6."""
    from vmrframe_tpu.layers.basic import DepthwiseConv1D

    rng = np.random.default_rng(0)
    B, L, D, k = 4, 33, 16, 7
    x = jnp.asarray(rng.standard_normal((B, L, D)).astype(np.float32))
    g = jnp.asarray(rng.standard_normal((B, L, D)).astype(np.float32))
    conv = DepthwiseConv1D(D, k, impl="conv")
    shift = DepthwiseConv1D(D, k, impl="shift")
    variables = conv.init(jax.random.PRNGKey(0), x)
    y_conv = conv.apply(variables, x)
    y_shift = shift.apply(variables, x)
    np.testing.assert_allclose(np.asarray(y_conv), np.asarray(y_shift),
                               atol=1e-6, rtol=1e-6)

    def loss(fn):
        return lambda v, x_: jnp.sum(fn.apply(v, x_) * g)

    gv_c, gx_c = jax.grad(loss(conv), argnums=(0, 1))(variables, x)
    gv_s, gx_s = jax.grad(loss(shift), argnums=(0, 1))(variables, x)
    np.testing.assert_allclose(np.asarray(gx_c), np.asarray(gx_s),
                               atol=1e-5, rtol=1e-5)
    kc = jax.tree_util.tree_leaves(gv_c)[0]
    ks = jax.tree_util.tree_leaves(gv_s)[0]
    np.testing.assert_allclose(np.asarray(kc), np.asarray(ks),
                               atol=1e-4, rtol=1e-4)
