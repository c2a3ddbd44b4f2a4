"""chunked_batch_apply: chunked == unchunked, exactly (ops/chunked.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vmrframe_tpu.ops.chunked import chunked_batch_apply


def test_chunked_equals_direct_on_model_like_fn():
    B, L, D = 16, 8, 4
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((D, D)).astype(np.float32))
    batch = {
        "vfeats": jnp.asarray(rng.standard_normal((B, L, D)).astype(np.float32)),
        "vmasks": jnp.asarray((rng.uniform(size=(B, L)) > 0.3).astype(np.float32)),
        "scale": jnp.float32(2.0),  # non-batch leaf: broadcast to every chunk
    }

    def fn(b):
        # per-sample math only — the contract chunking relies on
        h = jnp.tanh(b["vfeats"] @ w) * b["vmasks"][..., None] * b["scale"]
        return {"pooled": h.sum(axis=1), "score": jax.nn.softmax(h.mean(axis=2), axis=-1)}

    direct = fn(batch)
    for chunk in (4, 8, 16, 32):
        for unroll in (True, False):
            out = jax.jit(lambda b: chunked_batch_apply(
                fn, b, B, chunk, unroll=unroll))(batch)
            for k in direct:
                np.testing.assert_allclose(
                    np.asarray(out[k]), np.asarray(direct[k]), atol=1e-6,
                    err_msg=f"chunk={chunk} unroll={unroll} key={k}")


def test_chunked_requires_divisibility():
    batch = {"x": jnp.ones((10, 3))}
    with pytest.raises(AssertionError):
        chunked_batch_apply(lambda b: b["x"], batch, 10, 4)


def test_chunked_seqpan_eval_step_matches():
    """The production shape: SeqPAN fwd+infer at B=16 in 8-chunks equals the
    direct call bit-for-bit (same compiled math per chunk, fp-deterministic)."""
    import __graft_entry__ as ge
    from vmrframe_tpu.registry import get_model_entry

    B = 16
    cfg = ge._make_cfg(tiny=True, batch_size=B)
    model, entry, derived, batch, _ = ge._build(cfg, batch_size=B)
    rng = jax.random.PRNGKey(0)
    variables = model.init({"params": rng, "dropout": rng}, batch, True)

    def fwd_infer(b):
        out = model.apply(variables, b, True)
        return entry.infer_fn(out, b, cfg)

    direct = np.asarray(jax.jit(fwd_infer)(batch))
    chunked = np.asarray(jax.jit(
        lambda b: chunked_batch_apply(fwd_infer, b, B, 8))(batch))
    np.testing.assert_allclose(chunked, direct, atol=1e-6)
