import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vmrframe_tpu.config import Derived
from vmrframe_tpu.data.batcher import Batcher
from vmrframe_tpu.testing import make_synthetic_data
from vmrframe_tpu.train.trainer import Trainer


def test_gauss_weight_properties():
    from vmrframe_tpu.models.cpl import generate_gauss_weight

    L = 32
    center = jnp.asarray([0.5, 0.1])
    width = jnp.asarray([0.2, 0.4])
    vmask = jnp.ones((2, L))
    w = np.asarray(generate_gauss_weight(L, center, width, vmask))
    assert w.shape == (2, L)
    np.testing.assert_allclose(w.max(axis=1), 1.0, atol=1e-6)
    # peak near center fraction
    assert abs(np.argmax(w[0]) / (L - 1) - 0.5) < 0.1


def test_cpl_trains_weakly_supervised(charades_cfg):
    cfg = charades_cfg.updated({
        "model.name": "CPL",
        "others": {"cpl_num_props": 4, "cpl_div_lambda": 0.15, "cpl_div_loss_alhpa": 1.0},
    })
    dataset, store = make_synthetic_data(cfg, seed=0, n_train=16, n_test=8)
    derived = Derived(num_words=dataset["n_words"], num_chars=dataset["n_chars"],
                      num_train_steps=2, steps_per_epoch=2)
    train_b = Batcher(dataset["train_set"], store, cfg, derived, "train")
    test_b = Batcher(dataset["test_set"], store, cfg, derived, "test")
    trainer = Trainer(cfg, derived, dataset["word_vector"])
    rng = jax.random.PRNGKey(0)
    state = trainer.init_state(rng, next(train_b.epoch(seed=0)))
    step = trainer.compiled_train_step()
    for batch in train_b.epoch(seed=0):
        state, m = step(state, trainer._shard_batch(batch), rng)
        assert np.isfinite(float(m["loss"]))
    ious, _, _, props = trainer.run_eval_epoch(state, test_b.epoch(seed=0), collect_props=True)
    assert np.all(props[:, 0] <= props[:, 1] + 1e-6)
    assert np.all(props >= 0) and np.all(props <= 1)


def test_shared_prefix_matches_repeated_path(charades_cfg):
    """others.cpl_shared_prefix computes each decoder's first-layer q/k/v +
    logits + softmax once per clip instead of once per proposal; in
    deterministic mode the outputs must EQUAL the repeated-input path
    (same params — the flag changes call shapes only)."""
    from vmrframe_tpu.registry import get_model_entry

    base = charades_cfg.updated({
        "model.name": "CPL",
        "others": {"cpl_num_props": 4, "cpl_div_lambda": 0.15,
                   "cpl_div_loss_alhpa": 1.0},
    })
    cfg_shared = base.updated({"others.cpl_shared_prefix": "always"})
    cfg_rep = base.updated({"others.cpl_shared_prefix": False})
    dataset, store = make_synthetic_data(base, seed=0, n_train=8, n_test=4)
    derived = Derived(num_words=dataset["n_words"], num_chars=dataset["n_chars"],
                      num_train_steps=2, steps_per_epoch=2)
    batch = next(Batcher(dataset["train_set"], store, base, derived, "train").epoch(seed=0))
    batch = {k: jnp.asarray(v) for k, v in batch.items()
             if hasattr(v, "dtype") or isinstance(v, (list, tuple))}

    entry = get_model_entry("CPL")
    rng = jax.random.PRNGKey(0)
    m_shared = entry.model_cls(cfg_shared, derived, dataset["word_vector"])
    m_rep = entry.model_cls(cfg_rep, derived, dataset["word_vector"])
    variables = m_rep.init({"params": rng, "dropout": rng, "gumbel": rng}, batch, True)

    out_rep = m_rep.apply(variables, batch, True)
    out_shared = m_shared.apply(variables, batch, True)
    assert set(out_rep) == set(out_shared)
    for k in out_rep:
        np.testing.assert_allclose(np.asarray(out_shared[k]), np.asarray(out_rep[k]),
                                   atol=2e-4,
                                   err_msg=f"output {k} diverged")

    # train mode ("always" opts the shared path into training too): same
    # param tree, finite loss, grads flow through the shared path (dropout
    # masks differ by construction — per-(b,p) independence is preserved,
    # not bitwise identity)
    consts = {k: v for k, v in variables.items() if k != "params"}

    def loss_fn(params, model):
        out = model.apply({"params": params, **consts}, batch, False,
                          rngs={"dropout": jax.random.PRNGKey(1),
                                "gumbel": jax.random.PRNGKey(2)})
        return entry.loss_fn(out, batch, cfg_shared)

    loss, grads = jax.value_and_grad(loss_fn)(variables["params"], m_shared)
    assert np.isfinite(float(loss))
    gnorm = sum(float(jnp.sum(jnp.abs(g))) for g in jax.tree_util.tree_leaves(grads))
    assert gnorm > 0


def test_remat_matches_baseline(charades_cfg):
    """others.cpl_remat replays the decoder layers inside the backward
    instead of saving the (B*P, H, Tq, Tk) prob-map residuals
    (docs/TRACE_CPL_TRAIN.json: the train step is HBM-bound on exactly that
    traffic).  jax.checkpoint replays the SAME dropout rng, so both the
    outputs and the gradients must match the non-remat path."""
    from vmrframe_tpu.registry import get_model_entry

    base = charades_cfg.updated({
        "model.name": "CPL",
        "others": {"cpl_num_props": 4, "cpl_div_lambda": 0.15,
                   "cpl_div_loss_alhpa": 1.0, "cpl_shared_prefix": False},
    })
    cfg_rm = base.updated({"others.cpl_remat": True})
    dataset, store = make_synthetic_data(base, seed=0, n_train=8, n_test=4)
    derived = Derived(num_words=dataset["n_words"], num_chars=dataset["n_chars"],
                      num_train_steps=2, steps_per_epoch=2)
    batch = next(Batcher(dataset["train_set"], store, base, derived, "train").epoch(seed=0))
    batch = {k: jnp.asarray(v) for k, v in batch.items() if hasattr(v, "dtype")}

    entry = get_model_entry("CPL")
    rng = jax.random.PRNGKey(0)
    m0 = entry.model_cls(base, derived, dataset["word_vector"])
    m1 = entry.model_cls(cfg_rm, derived, dataset["word_vector"])
    variables = m0.init({"params": rng, "dropout": rng, "gumbel": rng}, batch, True)
    # identical param trees: remat is a transform, not a module change
    v1 = m1.init({"params": rng, "dropout": rng, "gumbel": rng}, batch, True)
    assert jax.tree_util.tree_structure(variables) == jax.tree_util.tree_structure(v1)

    out0 = m0.apply(variables, batch, True)
    out1 = m1.apply(variables, batch, True)
    for k in out0:
        np.testing.assert_allclose(np.asarray(out1[k]), np.asarray(out0[k]),
                                   atol=1e-6, err_msg=f"eval output {k} diverged")

    consts = {k: v for k, v in variables.items() if k != "params"}

    def loss_fn(params, model):
        out = model.apply({"params": params, **consts}, batch, False,
                          rngs={"dropout": jax.random.PRNGKey(1),
                                "gumbel": jax.random.PRNGKey(2)})
        return entry.loss_fn(out, batch, base)

    l0, g0 = jax.value_and_grad(loss_fn)(variables["params"], m0)
    l1, g1 = jax.value_and_grad(loss_fn)(variables["params"], m1)
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-6)
    for p0, p1 in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(p1), np.asarray(p0),
                                   atol=5e-6, rtol=1e-5)
