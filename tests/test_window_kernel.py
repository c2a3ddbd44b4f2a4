"""Banded (sliding-window) Pallas attention kernel vs the XLA band-mask
path — forward and gradients (interpret mode on CPU)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vmrframe_tpu.kernels.window_attention import banded_attention


def xla_band_attention(q, k, v, kv_mask, window):
    """The exact math MaskedMHCA computes for window_size > 0
    (vmrframe_tpu/layers/actionformer.py:140-162), without the conv/LN."""
    B, H, T, hd = q.shape
    att = jnp.einsum("bhqd,bhkd->bhqk", q / np.sqrt(hd), k)
    neg = jnp.finfo(att.dtype).min
    att = jnp.where(kv_mask[:, None, None, :] > 0, att, neg)
    qi = jnp.arange(T)[:, None]
    kj = jnp.arange(T)[None, :]
    att = jnp.where((jnp.abs(qi - kj) <= window // 2)[None, None], att, neg)
    p = jax.nn.softmax(att, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v * kv_mask[:, None, :, None])


@pytest.mark.parametrize("T,window", [(512, 19), (512, 9), (640, 37), (384, 5)])
def test_banded_forward_matches_xla(T, window):
    rng = np.random.default_rng(0)
    B, H, hd = 2, 2, 32
    q = rng.normal(size=(B, H, T, hd)).astype(np.float32)
    k = rng.normal(size=(B, H, T, hd)).astype(np.float32)
    v = rng.normal(size=(B, H, T, hd)).astype(np.float32)
    lens = np.array([T, T - 100])
    kv_mask = (np.arange(T)[None] < lens[:, None]).astype(np.float32)

    got = banded_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                           jnp.asarray(kv_mask), window, interpret=True)
    want = xla_band_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                              jnp.asarray(kv_mask), window)
    # compare on valid QUERY rows (like MaskedMHCA, callers mask the rest)
    m = kv_mask[:, None, :, None]
    np.testing.assert_allclose(np.asarray(got) * m, np.asarray(want) * m,
                               atol=2e-5, rtol=1e-5)


def test_banded_gradients_match_xla():
    rng = np.random.default_rng(1)
    B, H, T, hd, window = 1, 2, 384, 16, 19
    q = rng.normal(size=(B, H, T, hd)).astype(np.float32)
    k = rng.normal(size=(B, H, T, hd)).astype(np.float32)
    v = rng.normal(size=(B, H, T, hd)).astype(np.float32)
    lens = np.array([T - 50])
    kv_mask = jnp.asarray((np.arange(T)[None] < lens[:, None]).astype(np.float32))
    # downstream weights: only valid query rows contribute (like MaskedMHCA's
    # output masking)
    w = jnp.asarray(rng.normal(size=(B, H, T, hd)).astype(np.float32)) \
        * kv_mask[:, None, :, None]

    def loss_kernel(q, k, v):
        out = banded_attention(q, k, v, kv_mask, window, interpret=True)
        return jnp.sum(out * w)

    def loss_xla(q, k, v):
        out = xla_band_attention(q, k, v, kv_mask, window)
        return jnp.sum(out * w)

    gk = jax.grad(loss_kernel, argnums=(0, 1, 2))(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    for a, b, name in zip(gk, gx, ("dq", "dk", "dv")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5, rtol=1e-4,
                                   err_msg=f"{name} diverges from the XLA band path")


def test_masked_mhca_banded_path_matches_xla():
    """The auto-enabled kernel path inside MaskedMHCA is numerically the
    XLA band-mask path (same params, same inputs)."""
    from vmrframe_tpu.layers.actionformer import MaskedMHCA

    rng = np.random.default_rng(2)
    B, T, C, H, window = 2, 512, 64, 4, 19
    x = jnp.asarray(rng.normal(size=(B, T, C)).astype(np.float32))
    lens = np.array([T, T - 70])
    mask = jnp.asarray((np.arange(T)[None] < lens[:, None]).astype(np.float32))

    xla_mod = MaskedMHCA(C, H, window_size=window, pallas_min_len=-1)
    kern_mod = MaskedMHCA(C, H, window_size=window, pallas_min_len=256,
                          pallas_interpret=True)
    params = xla_mod.init(jax.random.PRNGKey(0), x, mask)
    want, want_mask = xla_mod.apply(params, x, mask)
    got, got_mask = kern_mod.apply(params, x, mask)
    np.testing.assert_allclose(np.asarray(got_mask), np.asarray(want_mask))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-5, rtol=1e-4)


def test_masked_mhca_banded_gate_conditions():
    """Eligibility: rel-PE, short T, live attention dropout, and explicit
    disable all fall back to the XLA path."""
    from vmrframe_tpu.layers.actionformer import MaskedMHCA

    m = MaskedMHCA(64, 4, window_size=19, pallas_min_len=256, pallas_interpret=True)
    assert m._use_banded_kernel(512, 512, True)
    assert not m._use_banded_kernel(192, 192, True)          # below threshold
    assert not m._use_banded_kernel(512, 256, True)          # Tq != Tk
    assert not MaskedMHCA(64, 4, window_size=19, use_rel_pe=True,
                          pallas_min_len=256, pallas_interpret=True
                          )._use_banded_kernel(512, 512, True)
    assert not MaskedMHCA(64, 4, window_size=19, attn_pdrop=0.1,
                          pallas_min_len=256, pallas_interpret=True
                          )._use_banded_kernel(512, 512, False)  # live dropout
    assert not MaskedMHCA(64, 4, window_size=19, pallas_min_len=-1,
                          pallas_interpret=True)._use_banded_kernel(512, 512, True)
    assert not MaskedMHCA(64, 4, window_size=-1, pallas_min_len=256,
                          pallas_interpret=True)._use_banded_kernel(512, 512, True)


def test_masked_mhca_banded_gate_mode_split():
    """pallas_min_len_eval splits the auto-enable by mode (measured:
    Pallas wins train, XLA wins eval at the shipped long config —
    docs/BENCH_AF_LONG.json)."""
    from vmrframe_tpu.layers.actionformer import MaskedMHCA

    m = MaskedMHCA(64, 4, window_size=19, pallas_min_len=256,
                   pallas_min_len_eval=-1, pallas_interpret=True)
    assert m._use_banded_kernel(512, 512, False)       # train: kernel on
    assert not m._use_banded_kernel(512, 512, True)    # eval: XLA band path
    # None inherits the train threshold (layer-level back-compat)
    m2 = MaskedMHCA(64, 4, window_size=19, pallas_min_len=256,
                    pallas_interpret=True)
    assert m2._use_banded_kernel(512, 512, True)
    # eval threshold can also be raised independently
    m3 = MaskedMHCA(64, 4, window_size=19, pallas_min_len=256,
                    pallas_min_len_eval=1024, pallas_interpret=True)
    assert not m3._use_banded_kernel(512, 512, True)
    assert m3._use_banded_kernel(1024, 1024, True)


def test_banded_kernel_bf16_inputs():
    """Mixed-precision path: bf16 q/k/v in, bf16 out, f32 accumulation
    inside — matches the XLA band path computed in f32 to bf16 tolerance."""
    rng = np.random.default_rng(3)
    B, H, T, hd, window = 1, 2, 384, 32, 19
    q, k, v = [rng.normal(size=(B, H, T, hd)).astype(np.float32) for _ in range(3)]
    kv_mask = np.ones((B, T), np.float32)
    bf = jnp.bfloat16
    got = banded_attention(jnp.asarray(q, bf), jnp.asarray(k, bf), jnp.asarray(v, bf),
                           jnp.asarray(kv_mask, bf), window, interpret=True)
    assert got.dtype == bf
    want = xla_band_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                              jnp.asarray(kv_mask), window)
    np.testing.assert_allclose(np.asarray(got, np.float32), np.asarray(want),
                               atol=0.05, rtol=0.05)
