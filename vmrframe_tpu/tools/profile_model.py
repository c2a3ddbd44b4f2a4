"""Train-step decomposition for ANY zoo model on the real chip.

Generalizes tools/profile_seqpan.py's train-mode split (which is SeqPAN-
only) to every family in tools/bench_zoo.py's MODELS table, so the worst
MFU rows get profile-driven optimization targets instead of guesses:

  fwd_loss        forward + loss, train mode (fresh dropout/gumbel streams)
  loss_and_grad   jax.value_and_grad of the same
  grad_optimizer  ...plus clip + AdamW update + apply_updates
  full_train      trainer._train_step (adds span inference + IoU)
  eval_step       trainer._eval_step

Each piece runs inside one jitted ``lax.fori_loop`` with a loop-carried
dependency and a byte-fetch barrier; two loop lengths are differenced so
the fetch round-trip cancels (the bench.py protocol).  Per-piece XLA cost
analysis (GFLOP, HBM bytes) and the steady-state while-body kernel count
(tools/roofline.py's parser) locate whether a sink is FLOPs, bandwidth, or
schedule granularity.

Writes docs/PROFILE_<MODEL>.json.
Usage: python -m vmrframe_tpu.tools.profile_model --model CPL [--cpu]
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))


def _timed(fn, args, n_small, n_big, reps=3):
    def run(n):
        out = fn(*args, np.int32(n))
        np.asarray(out)  # byte fetch = completion barrier through the tunnel

    run(n_small)  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        run(n_big)
        t_big = time.perf_counter() - t0
        t0 = time.perf_counter()
        run(n_small)
        t_small = time.perf_counter() - t0
        best = min(best, (t_big - t_small) / (n_big - n_small))
    return best


def profile(model_name: str, n_small: int, n_big: int, batch_size: int | None = None):
    import jax
    import jax.numpy as jnp

    from vmrframe_tpu.config import Derived, load_config
    from vmrframe_tpu.data.batcher import Batcher
    from vmrframe_tpu.registry import get_model_entry
    from vmrframe_tpu.testing import make_synthetic_data
    from vmrframe_tpu.train.trainer import Trainer
    from vmrframe_tpu.tools.bench_zoo import MODELS, _apply_overrides, _first_float_key
    from vmrframe_tpu.tools.roofline import find_steady_body

    path, overrides = MODELS[model_name]
    cfg = _apply_overrides(load_config(path), overrides)
    if batch_size:
        cfg = cfg.updated({"train.batch_size": batch_size})
    B = int(cfg.train.batch_size)
    print(json.dumps({"building": model_name, "batch": B}), flush=True)
    dataset, store = make_synthetic_data(cfg, seed=0, n_train=2 * B, n_test=B)
    derived = Derived(num_words=dataset["n_words"], num_chars=dataset["n_chars"],
                      num_train_steps=1000, steps_per_epoch=10)
    entry = get_model_entry(cfg.model.name)
    batcher_cls = entry.batcher_cls or Batcher
    batch = next(batcher_cls(dataset["train_set"], store, cfg, derived, "train").epoch(seed=0))
    trainer = Trainer(cfg, derived, dataset["word_vector"])
    rng = jax.random.PRNGKey(0)
    state = trainer.init_state(rng, batch)
    step_rng = jax.random.key(0, impl=str(cfg.train.get("prng_impl", "rbg")))
    device_batch = trainer._shard_batch(batch)
    pkey = _first_float_key(device_batch)

    def perturb(batch, tok):
        b = dict(batch)
        b[pkey] = batch[pkey] + (tok * 1e-9).astype(batch[pkey].dtype)
        return b

    # the loss_fn _train_step builds, reproduced standalone so the fwd and
    # grad pieces time EXACTLY the production computation
    def loss_value(params, batch, rng, step):
        st = state
        batch = trainer._maybe_device_pipeline(batch)
        r = jax.random.fold_in(rng, step)
        d_rng, g_rng = jax.random.split(r)
        mutable = [k for k in st.constants if k != "constants"]
        variables = trainer._cast_for_compute({"params": params, **st.constants})
        cbatch = trainer._cast_for_compute(batch)
        rngs = {"dropout": d_rng, "gumbel": g_rng}
        if mutable:
            outputs, _ = trainer.model.apply(variables, cbatch, False, rngs=rngs,
                                             mutable=mutable)
        else:
            outputs = trainer.model.apply(variables, cbatch, False, rngs=rngs)
        outputs = trainer._upcast_outputs(outputs)
        if entry.stateful:
            loss, _ = entry.loss_fn(outputs, batch, cfg, st.extras)
        else:
            loss = entry.loss_fn(outputs, batch, cfg)
        return loss

    @jax.jit
    def fwd_loop(params, batch, rng, n):
        def body(i, tok):
            loss = loss_value(params, perturb(batch, tok), rng, i)
            return loss.astype(jnp.float32)
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    @jax.jit
    def grad_loop(params, batch, rng, n):
        def body(i, carry):
            p, tok = carry
            loss, grads = jax.value_and_grad(loss_value)(p, perturb(batch, tok), rng, i)
            p2 = jax.tree_util.tree_map(lambda a, g: a + 1e-12 * g, p, grads)
            return (p2, loss.astype(jnp.float32))
        _, tok = jax.lax.fori_loop(0, n, body, (params, jnp.float32(0.0)))
        return tok

    @jax.jit
    def opt_loop(params, opt_state, batch, rng, n):
        import optax

        def body(i, carry):
            p, os_, tok = carry
            loss, grads = jax.value_and_grad(loss_value)(p, perturb(batch, tok), rng, i)
            updates, os2 = trainer.tx.update(grads, os_, p)
            p2 = optax.apply_updates(p, updates)
            return (p2, os2, loss.astype(jnp.float32))
        _, _, tok = jax.lax.fori_loop(0, n, body, (params, opt_state, jnp.float32(0.0)))
        return tok

    @jax.jit
    def train_loop(st, batch, rng, n):
        def body(i, carry):
            s, tok = carry
            s2, metrics = trainer._train_step(s, perturb(batch, tok), rng)
            return (s2, metrics["loss"].astype(jnp.float32))
        _, tok = jax.lax.fori_loop(0, n, body, (st, jnp.float32(0.0)))
        return tok

    @jax.jit
    def eval_loop(st, batch, n):
        def body(i, tok):
            metrics = trainer._eval_step(st, perturb(batch, tok))
            return jnp.sum(metrics["ious"]).astype(jnp.float32)
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    pieces = {
        "fwd_loss": (fwd_loop, (state.params, device_batch, step_rng)),
        "loss_and_grad": (grad_loop, (state.params, device_batch, step_rng)),
        "grad_optimizer": (opt_loop, (state.params, state.opt_state, device_batch, step_rng)),
        "full_train": (train_loop, (state, device_batch, step_rng)),
        "eval_step": (eval_loop, (state, device_batch)),
    }
    out = {"model": model_name, "batch_size": B,
           "config": os.path.relpath(path, "/root/reference"), "pieces": {}}
    for name, (fn, args) in pieces.items():
        ns, nb = (n_small * 5, n_big * 5) if name == "eval_step" else (n_small, n_big)
        sec = _timed(fn, args, ns, nb)
        row = {"ms": round(sec * 1e3, 3)}
        try:
            lowered = fn.lower(*args, np.int32(nb))
            compiled = lowered.compile()
            ca = compiled.cost_analysis()
            # per-iteration: the loop runs nb times inside one program
            row["gflop"] = round(float(ca.get("flops", 0.0)) / nb / 1e9, 3)
            row["hbm_gb_s"] = round(
                float(ca.get("bytes accessed", 0.0)) / nb / sec / 1e9, 1)
            # v5e bf16 peak (f32 emulated on the same MXU — conservative)
            row["mfu_pct"] = round(
                100.0 * float(ca.get("flops", 0.0)) / nb / sec / 394e12, 2)
            hlo = compiled.as_text()
            body = find_steady_body(hlo)
            row["steady_kernels"] = body.count("\n") if body else None
        except Exception as e:  # cost analysis is backend-dependent
            row["cost_error"] = f"{type(e).__name__}: {e}"
        out["pieces"][name] = row
        print(json.dumps({name: row}), flush=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True)
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--n-small", type=int, default=5)
    ap.add_argument("--n-big", type=int, default=25)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    res = profile(args.model, args.n_small, args.n_big, args.batch)
    out = args.out or os.path.join(REPO, "docs", f"PROFILE_{args.model.upper()}.json")
    with open(out, "w") as f:
        json.dump(res, f, indent=2)
    print("wrote", out)


if __name__ == "__main__":
    main()
