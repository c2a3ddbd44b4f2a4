"""Data-parallel numerical equivalence: the SAME global batch through the
8-device sharded train step and through a 1-device mesh must produce the
same losses and the same updated parameters.

This pins the DP sharding directly (replacing the reference's
nn.DataParallel, main.py:22-24): the trajectory-parity suites vs torch imply
it indirectly, but an explicit mesh-vs-single assertion catches future
sharding-spec mistakes (a wrong PartitionSpec silently changes batch
statistics or gradient reductions long before any torch comparison runs).

Stochastic streams: ``jax_threefry_partitionable`` makes jax.random draws
independent of the array sharding, so dropout masks and SeqPAN's gumbel
noise are bit-identical across meshes — the test runs the PRODUCTION
stochastic train step, not a dropout-free simplification.  f32 end to end;
the only cross-mesh difference left is all-reduce summation order.

Tolerances: losses/ious at 1e-6 (the sharp check — the step-2 loss runs the
forward on step-1's UPDATED params, so any real parameter divergence shows
up here at full precision).  Updated params at 5e-4: Adam's first-step
update is ~lr·g/(|g|+eps), which amplifies f32 summation-order noise
unboundedly for elements with |g| near eps (measured: a 1.9e-6 one-step
loss delta, pure reduction order, produces up to ~5e-5 on isolated
near-zero-gradient params with the conv depthwise lowering, and ~1.2e-4 on
a scalar predictor bias after the round-5 shift-formulation change to the
weight-grad reduction order) — a real sharding bug (wrong PartitionSpec,
missing psum) changes grads at O(1) relative and blows both checks.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vmrframe_tpu.config import Derived, load_config
from vmrframe_tpu.data.batcher import Batcher
from vmrframe_tpu.parallel import make_mesh
from vmrframe_tpu.registry import get_model_entry
from vmrframe_tpu.testing import make_synthetic_data
from vmrframe_tpu.train.trainer import Trainer

CONFIGS = {
    "SeqPAN": "tests/configs/charades_seqpan.yaml",
    "BAN": "tests/configs/charades_ban.json",
}


@pytest.fixture()
def partitionable_threefry():
    old = jax.config.jax_threefry_partitionable
    jax.config.update("jax_threefry_partitionable", True)
    yield
    jax.config.update("jax_threefry_partitionable", old)


@pytest.mark.parametrize("family", ["SeqPAN", "BAN"])
def test_sharded_step_matches_single_device(family, partitionable_threefry):
    cfg = load_config(CONFIGS[family])
    cfg = cfg.updated({"train.prng_impl": "threefry"})
    B = int(cfg.train.batch_size)
    assert B % 8 == 0, "batch must split over the 8-device test mesh"

    dataset, store = make_synthetic_data(cfg, seed=0, n_train=B, n_test=B)
    derived = Derived(num_words=dataset["n_words"], num_chars=dataset["n_chars"],
                      num_train_steps=6, steps_per_epoch=2)
    entry = get_model_entry(family)
    batcher_cls = entry.batcher_cls or Batcher
    batch = next(batcher_cls(dataset["train_set"], store, cfg, derived, "train")
                 .epoch(seed=0, shuffle=False))

    t8 = Trainer(cfg, derived, dataset["word_vector"])
    t1 = Trainer(cfg, derived, dataset["word_vector"],
                 mesh=make_mesh(devices=jax.devices()[:1]))
    assert t8.mesh.devices.size == 8 and t1.mesh.devices.size == 1

    rng = jax.random.PRNGKey(0)
    s8 = t8.init_state(rng, batch)
    s1 = t1.init_state(rng, batch)
    step_rng = jax.random.PRNGKey(0)  # threefry (partitionable via fixture)

    losses8, losses1 = [], []
    for _ in range(2):
        s8, m8 = t8.compiled_train_step()(s8, t8._shard_batch(batch), step_rng)
        s1, m1 = t1.compiled_train_step()(s1, t1._shard_batch(batch), step_rng)
        losses8.append(float(m8["loss"]))
        losses1.append(float(m1["loss"]))
        np.testing.assert_allclose(np.asarray(m8["ious"]), np.asarray(m1["ious"]),
                                   rtol=1e-6, atol=1e-6)

    np.testing.assert_allclose(losses8, losses1, rtol=1e-6, atol=1e-6,
                               err_msg="per-step losses diverge across meshes")

    p8 = jax.tree_util.tree_map(np.asarray, s8.params)
    p1 = jax.tree_util.tree_map(np.asarray, s1.params)
    flat8, _ = jax.tree_util.tree_flatten_with_path(p8)
    flat1 = jax.tree_util.tree_leaves(p1)
    assert len(flat8) == len(flat1)
    for (path, a), b in zip(flat8, flat1):
        if not jnp.issubdtype(a.dtype, jnp.floating):
            continue
        np.testing.assert_allclose(
            a, b, rtol=5e-4, atol=5e-4,
            err_msg=f"updated param {jax.tree_util.keystr(path)} diverges "
                    "between the 8-device and 1-device train steps")
