"""flat_adamw == the optax tree chain, step for step (train/optim.py).

The flat single-buffer optimizer is the production default (the tree chain
was measured at 5.5 ms of a 9.4 ms SeqPAN train step on v5e — hundreds of
tiny per-leaf kernels); these tests pin its numerics to the reference-
semantics tree implementation on a REAL model parameter tree, including the
decay-mask name list and teacher freezing.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vmrframe_tpu.config import Derived
from vmrframe_tpu.data.batcher import Batcher
from vmrframe_tpu.testing import make_synthetic_data
from vmrframe_tpu.train.optim import flat_adamw, tree_adamw


@pytest.fixture(scope="module")
def model_params(charades_cfg_module=None):
    from vmrframe_tpu.config import load_config
    import os

    cfg = load_config(os.path.join(os.path.dirname(__file__), "configs",
                                   "charades_seqpan.yaml"))
    dataset, store = make_synthetic_data(cfg, seed=0, n_train=4, n_test=2)
    derived = Derived(num_words=dataset["n_words"], num_chars=dataset["n_chars"],
                      num_train_steps=8, steps_per_epoch=2)
    from vmrframe_tpu.registry import get_model_entry

    entry = get_model_entry(cfg.model.name)
    batch = next(Batcher(dataset["train_set"], store, cfg, derived,
                         "train").epoch(seed=0, shuffle=False))
    model = entry.model_cls(cfg, derived, dataset["word_vector"])
    rng = jax.random.PRNGKey(0)
    variables = model.init({"params": rng, "dropout": rng}, batch, True)
    return cfg, variables["params"]


def _run_steps(tx, params, grads_seq):
    state = tx.init(params)
    out = params
    for g in grads_seq:
        updates, state = tx.update(g, state, out)
        out = jax.tree_util.tree_map(lambda p, u: p + u, out, updates)
    return out


def _random_grads(params, seed, n):
    leaves, treedef = jax.tree_util.tree_flatten(params)
    rng = np.random.default_rng(seed)
    seq = []
    for _ in range(n):
        gl = [jnp.asarray(rng.standard_normal(l.shape).astype(np.float32) * 0.1)
              for l in leaves]
        seq.append(jax.tree_util.tree_unflatten(treedef, gl))
    return seq


@pytest.mark.parametrize("frozen", [None, "predictor"])
def test_flat_adamw_matches_tree_chain(model_params, frozen):
    cfg, params = model_params
    frozen_filter = (None if frozen is None
                     else (lambda path: frozen in path))
    flat = flat_adamw(cfg, num_train_steps=8, frozen_filter=frozen_filter)
    tree = tree_adamw(cfg, num_train_steps=8, frozen_filter=frozen_filter)
    grads_seq = _random_grads(params, seed=1, n=5)
    # one sequence crosses the clip threshold (big grads), one does not
    big = [jax.tree_util.tree_map(lambda g: g * 100.0, grads_seq[0])]
    for seq in (grads_seq, big):
        p_flat = _run_steps(flat, params, seq)
        p_tree = _run_steps(tree, params, seq)
        flat_leaves = jax.tree_util.tree_leaves_with_path(p_flat)
        tree_leaves = dict(jax.tree_util.tree_leaves_with_path(p_tree))
        for path, leaf in flat_leaves:
            np.testing.assert_allclose(
                np.asarray(leaf), np.asarray(tree_leaves[path]),
                rtol=2e-5, atol=1e-6,
                err_msg=f"param mismatch at {jax.tree_util.keystr(path)}")


def test_build_optimizer_auto_follows_registry_hint(model_params):
    """``train.flat_optimizer`` default "auto" routes via the per-family
    measured hint (registry ``optimizer_impl``); an explicit cfg bool always
    wins over the hint."""
    from types import SimpleNamespace

    from vmrframe_tpu.train.optim import build_optimizer

    cfg, params = model_params

    def impl_of(tx):
        # flat_adamw state is a dict with a raveled "mu"; the optax chain's
        # init returns a tuple of per-transform states
        state = tx.init(params)
        return "flat" if isinstance(state, dict) and "mu" in state else "tree"

    # auto + no hint -> flat (the general default)
    assert impl_of(build_optimizer(cfg, 8)) == "flat"
    # auto + tree hint (ActionFormer/BAN measured rows) -> tree chain
    assert impl_of(build_optimizer(cfg, 8, impl_hint="tree")) == "tree"

    def with_flat(value):
        t = cfg.train
        return SimpleNamespace(train=SimpleNamespace(
            flat_optimizer=value, clip_norm=t.clip_norm, lr=t.lr,
            warmup_proportion=t.warmup_proportion))

    ns_true, ns_false = with_flat(True), with_flat(False)
    # explicit bool overrides the hint in both directions
    assert impl_of(build_optimizer(ns_true, 8, impl_hint="tree")) == "flat"
    assert impl_of(build_optimizer(ns_false, 8, impl_hint=None)) == "tree"
    # registered hints resolve: AF/BAN/CCA are tree, SeqPAN/CPL default flat
    from vmrframe_tpu.registry import get_model_entry

    assert get_model_entry("ActionFormer").optimizer_impl == "tree"
    assert get_model_entry("BAN").optimizer_impl == "tree"
    assert get_model_entry("CCA").optimizer_impl == "tree"
    assert get_model_entry("SeqPAN").optimizer_impl is None


def test_flat_adamw_frozen_params_pinned(model_params):
    cfg, params = model_params
    flat = flat_adamw(cfg, num_train_steps=8,
                      frozen_filter=lambda p: "predictor" in p)
    seq = _random_grads(params, seed=2, n=3)
    out = _run_steps(flat, params, seq)
    moved = frozen_same = 0
    flat_out = jax.tree_util.tree_leaves_with_path(out)
    orig = dict(jax.tree_util.tree_leaves_with_path(params))
    for path, leaf in flat_out:
        name = jax.tree_util.keystr(path)
        if "predictor" in name:
            np.testing.assert_array_equal(np.asarray(leaf),
                                          np.asarray(orig[path]))
            frozen_same += 1
        elif not np.allclose(np.asarray(leaf), np.asarray(orig[path])):
            moved += 1
    assert frozen_same > 0 and moved > 0
