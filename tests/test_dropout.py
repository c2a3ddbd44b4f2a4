"""layers/dropout.py: the u32 path must be bit-identical to flax's
nn.Dropout (it replaced every call site), and the u8 path must be a real
dropout — correct realized rate, exact expectation scaling, deterministic
passthrough."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from vmrframe_tpu.layers.dropout import Dropout, dropout_bits, set_default_dropout_bits

pytestmark = pytest.mark.quick


@pytest.fixture(autouse=True)
def _restore_bits():
    before = dropout_bits()
    yield
    set_default_dropout_bits(before)


def _apply(mod_cls, rate, x, rng):
    class M(nn.Module):
        @nn.compact
        def __call__(self, x):
            return mod_cls(rate)(x, deterministic=False)

    m = M()
    variables = m.init({"params": rng, "dropout": rng}, x)
    return m.apply(variables, x, rngs={"dropout": rng})


def test_u32_path_matches_flax_bitwise():
    set_default_dropout_bits(32)
    x = jax.random.normal(jax.random.PRNGKey(1), (64, 37))
    rng = jax.random.PRNGKey(7)
    ours = _apply(Dropout, 0.2, x, rng)
    flax = _apply(nn.Dropout, 0.2, x, rng)
    np.testing.assert_array_equal(np.asarray(ours), np.asarray(flax))


def test_u8_realized_rate_and_scale():
    set_default_dropout_bits(8)
    rate = 0.2
    t = round(rate * 256)  # 51
    q_keep = (256 - t) / 256
    x = jnp.ones((512, 512))
    out = np.asarray(_apply(Dropout, rate, x, jax.random.PRNGKey(3)))
    kept = out != 0.0
    # realized keep rate within 4 sigma of the quantized probability
    n = out.size
    assert abs(kept.mean() - q_keep) < 4 * np.sqrt(q_keep * (1 - q_keep) / n)
    # surviving elements are scaled by exactly 1/q_keep -> expectation exact
    np.testing.assert_allclose(out[kept], 1.0 / q_keep, rtol=1e-6)
    assert abs(out.mean() - 1.0) < 5e-3


def test_u8_deterministic_and_zero_rate_passthrough():
    set_default_dropout_bits(8)
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 8))

    class M(nn.Module):
        rate: float
        det: bool

        @nn.compact
        def __call__(self, x):
            return Dropout(self.rate)(x, deterministic=self.det)

    for rate, det in [(0.2, True), (0.0, False)]:
        m = M(rate=rate, det=det)
        v = m.init({"params": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)}, x)
        out = m.apply(v, x, rngs={"dropout": jax.random.PRNGKey(2)})
        np.testing.assert_array_equal(np.asarray(out), np.asarray(x))


def test_u8_lowered_rng_is_one_byte_per_element():
    """The point of the feature: the TPU/CPU backends must emit a u8
    rng-bit-generator, not a u32 draw that gets truncated."""
    set_default_dropout_bits(8)
    x = jnp.ones((128, 4, 64, 64))

    class M(nn.Module):
        @nn.compact
        def __call__(self, x):
            return Dropout(0.2)(x, deterministic=False)

    m = M()
    v = m.init({"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(0)}, x)
    rbg_key = jax.random.key(0, impl="rbg")

    def f(x, k):
        return m.apply(v, x, rngs={"dropout": k})

    # assert at the StableHLO level: the CPU backend later expands
    # rng_bit_generator into arithmetic, and the suite's forced 8-device
    # mesh shards the printed shapes — the lowering is the stable surface
    txt = jax.jit(f).lower(x, rbg_key).as_text()
    rng_lines = [l for l in txt.splitlines() if "rng_bit_generator" in l]
    assert rng_lines and all("ui8>" in l for l in rng_lines), rng_lines
    assert "128x4x64x64xui32" not in txt
