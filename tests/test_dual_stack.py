"""Fused dual-attention stack kernel (kernels/dual_stack.py) vs the XLA
module path: identical parameter trees, matching numerics (interpret mode),
odd-batch/ragged-mask padding."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vmrframe_tpu.kernels.dual_stack import dual_attention_stack
from vmrframe_tpu.layers.attention import DualAttentionBlock, DualAttentionBlockParams

D, H = 128, 4


def _module_stack(params, v, t, vm, tm):
    """The XLA path: v1=dab1(v,t); t1=dab1(t,v); v2=dab2(...); t2=dab2(...)."""
    dab1 = DualAttentionBlock(D, H, 0.0)
    dab2 = DualAttentionBlock(D, H, 0.0)
    a1 = lambda x, y, xm, ym: dab1.apply({"params": params["dual_attention_block_1"]},
                                         x, y, xm, ym, True)
    a2 = lambda x, y, xm, ym: dab2.apply({"params": params["dual_attention_block_2"]},
                                         x, y, xm, ym, True)
    v1 = a1(v, t, vm, tm)
    t1 = a1(t, v, tm, vm)
    return a2(v1, t1, vm, tm), a2(t1, v1, tm, vm)


def _init_params(rng, Lv=64, Lt=25, B=2):
    v = jnp.zeros((B, Lv, D))
    t = jnp.zeros((B, Lt, D))
    p1 = DualAttentionBlock(D, H, 0.0).init(rng, v, t, jnp.ones((B, Lv)),
                                            jnp.ones((B, Lt)), True)["params"]
    p2 = DualAttentionBlock(D, H, 0.0).init(jax.random.fold_in(rng, 1), v, t,
                                            jnp.ones((B, Lv)), jnp.ones((B, Lt)),
                                            True)["params"]
    return {"dual_attention_block_1": p1, "dual_attention_block_2": p2}


def _stacked(params, name):
    out = DualAttentionBlockParams(D, H, 0.0).apply({"params": params[name]})
    return out


@pytest.mark.parametrize("B,Lv,Lt", [(4, 64, 25), (3, 64, 25), (2, 40, 12)])
def test_kernel_matches_module_path(B, Lv, Lt):
    rng = jax.random.PRNGKey(0)
    params = _init_params(rng)
    rngs = jax.random.split(jax.random.PRNGKey(B), 4)
    v = jax.random.normal(rngs[0], (B, Lv, D))
    t = jax.random.normal(rngs[1], (B, Lt, D))
    vlens = jax.random.randint(rngs[2], (B,), Lv // 2, Lv + 1)
    tlens = jax.random.randint(rngs[3], (B,), 2, Lt + 1)
    vm = (jnp.arange(Lv)[None] < vlens[:, None]).astype(jnp.float32)
    tm = (jnp.arange(Lt)[None] < tlens[:, None]).astype(jnp.float32)

    want_v, want_t = _module_stack(params, v, t, vm, tm)
    got_v, got_t = dual_attention_stack(
        v, t, vm, tm, _stacked(params, "dual_attention_block_1"),
        _stacked(params, "dual_attention_block_2"), H, interpret=True)
    # only valid positions are consumed downstream (masks everywhere)
    np.testing.assert_allclose(np.asarray(got_v) * np.asarray(vm)[..., None],
                               np.asarray(want_v) * np.asarray(vm)[..., None],
                               atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(got_t) * np.asarray(tm)[..., None],
                               np.asarray(want_t) * np.asarray(tm)[..., None],
                               atol=2e-4, rtol=2e-4)


def test_param_tree_identical_between_paths(charades_cfg=None):
    """Init through the collector vs through the module: identical trees."""
    rng = jax.random.PRNGKey(0)
    v = jnp.zeros((2, 64, D))
    t = jnp.zeros((2, 25, D))
    module_tree = DualAttentionBlock(D, H, 0.0).init(
        rng, v, t, jnp.ones((2, 64)), jnp.ones((2, 25)), True)["params"]
    collector_tree = DualAttentionBlockParams(D, H, 0.0).init(rng)["params"]
    ms = jax.tree_util.tree_map(lambda x: (x.shape, x.dtype), module_tree)
    cs = jax.tree_util.tree_map(lambda x: (x.shape, x.dtype), collector_tree)
    assert ms == cs


def test_full_model_eval_matches_between_paths():
    """SeqPAN eval via the fused (interpret) path == the XLA module path from
    the SAME variables."""
    import os

    from vmrframe_tpu.config import Derived, load_config
    from vmrframe_tpu.registry import get_model_entry
    from vmrframe_tpu.testing import make_synthetic_data
    from vmrframe_tpu.data.batcher import Batcher

    cfg = load_config(os.path.join(os.path.dirname(__file__), "configs",
                                   "charades_seqpan.yaml")).updated(
        {"model.dim": 128, "model.num_heads": 4})
    dataset, store = make_synthetic_data(cfg, seed=0, n_train=4, n_test=4)
    derived = Derived(num_words=dataset["n_words"], num_chars=dataset["n_chars"],
                      num_train_steps=2, steps_per_epoch=1)
    entry = get_model_entry("SeqPAN")
    batcher = Batcher(dataset["test_set"], store, cfg, derived, "test")
    batch = next(batcher.epoch(seed=0, shuffle=False))

    rng = jax.random.PRNGKey(0)
    rngs = {"params": rng, "dropout": rng, "gumbel": rng}
    model_xla = entry.model_cls(cfg.updated({"model.fused_dual_stack": False}),
                                derived, dataset["word_vector"])
    variables = model_xla.init(rngs, batch, True)
    out_xla = model_xla.apply(variables, batch, True, rngs={"gumbel": rng})

    model_fused = entry.model_cls(cfg.updated({"model.fused_dual_stack": "interpret"}),
                                  derived, dataset["word_vector"])
    out_fused = model_fused.apply(variables, batch, True, rngs={"gumbel": rng})
    np.testing.assert_allclose(np.asarray(out_fused["slogits"]),
                               np.asarray(out_xla["slogits"]), atol=5e-4, rtol=5e-4)
    np.testing.assert_allclose(np.asarray(out_fused["elogits"]),
                               np.asarray(out_xla["elogits"]), atol=5e-4, rtol=5e-4)
