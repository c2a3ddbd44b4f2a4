"""Batch-scaling decomposition of the SeqPAN eval step on the real chip.

Round 2 measured throughput FALLING as batch grows (151k q/s @ B=128 ->
96k @ B=1024) — on an accelerator at ~4% MFU bigger batches should
amortize overhead, not regress.  This tool finds where the extra time goes:
for each batch size it times, with the fori-loop + byte-fetch protocol of
bench.py,

  - the bench harness's per-iteration ``jnp.roll`` data variation alone,
  - the model forward alone,
  - forward + span inference (the full bench body),

and records XLA's own cost analysis (flops / bytes accessed) for the
compiled loop body so superlinear terms show up as data, not guesses.

Writes docs/PROFILE_BATCH.json.
Usage: python -m vmrframe_tpu.tools.profile_batch [--batches 128,512,1024]
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))


def _timed_loop(make_body, args, n_small, n_big, reps=3):
    import jax
    import jax.numpy as jnp

    def make(n):
        @jax.jit
        def loop(*a):
            def body(i, acc):
                return make_body(i, acc, *a)
            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))
        return loop

    def t(n):
        fn = make(n)
        np.asarray(fn(*args))  # compile + warm; byte fetch = barrier
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(fn(*args))
            best = min(best, time.perf_counter() - t0)
        return best

    return (t(n_big) - t(n_small)) / (n_big - n_small)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="128,256,512,1024")
    ap.add_argument("--out", default=os.path.join(REPO, "docs", "PROFILE_BATCH.json"))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _build, _make_cfg

    results = {"device": str(jax.devices()[0]), "rows": []}
    for B in [int(b) for b in args.batches.split(",")]:
        cfg = _make_cfg(batch_size=B)
        model, entry, derived, batch, _ = _build(cfg, batch_size=B)
        rng = jax.random.PRNGKey(0)
        variables = model.init({"params": rng, "dropout": rng, "gumbel": rng}, batch, True)

        def to_bf16(tree):
            return jax.tree_util.tree_map(
                lambda x: x.astype(jnp.bfloat16)
                if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating) else x,
                tree)

        dev = jax.devices()[0]
        vb = to_bf16(jax.device_put(variables, dev))
        bb = to_bf16(jax.device_put(batch, dev))
        n_small, n_big = (50, 450) if B <= 256 else (20, 120)

        def roll_only(i, acc, variables, batch):
            v = jnp.roll(batch["vfeats"], i, axis=1) + acc * 1e-9
            return acc + jnp.sum(v[0, 0, :2].astype(jnp.float32))

        def fwd_only(i, acc, variables, batch):
            b = dict(batch)
            b["vfeats"] = jnp.roll(batch["vfeats"], i, axis=1) + acc * 1e-9
            out = model.apply(variables, b, True)
            return acc + jnp.sum(out["slogits"][:, :1].astype(jnp.float32))

        def fwd_infer(i, acc, variables, batch):
            b = dict(batch)
            b["vfeats"] = jnp.roll(batch["vfeats"], i, axis=1) + acc * 1e-9
            out = model.apply(variables, b, True)
            o32 = jax.tree_util.tree_map(
                lambda x: x.astype(jnp.float32)
                if hasattr(x, "dtype") and x.dtype == jnp.bfloat16 else x, out)
            props = entry.infer_fn(o32, batch, cfg)
            return acc + jnp.sum(props)

        row = {"batch": B}
        for name, body in (("roll_only", roll_only), ("fwd_only", fwd_only),
                           ("fwd_infer", fwd_infer)):
            ms = _timed_loop(body, (vb, bb), n_small, n_big) * 1e3
            row[f"{name}_ms"] = round(ms, 4)
            print(json.dumps({"batch": B, name: row[f"{name}_ms"]}), flush=True)
        row["qps_fwd_infer"] = round(B / (row["fwd_infer_ms"] / 1e3), 1)

        # XLA cost analysis of ONE bench body (outside the loop)
        @jax.jit
        def one(variables, batch):
            return fwd_infer(jnp.int32(1), jnp.float32(0.0), variables, batch)

        try:
            ca = one.lower(vb, bb).compile().cost_analysis()
            if isinstance(ca, list):
                ca = ca[0]
            row["xla_gflops"] = round(float(ca.get("flops", 0.0)) / 1e9, 3)
            row["xla_bytes_mb"] = round(float(ca.get("bytes accessed", 0.0)) / 1e6, 1)
            # implied HBM-bandwidth floor at ~819 GB/s (v5e)
            row["hbm_floor_ms"] = round(row["xla_bytes_mb"] / 819e3 * 1e3, 4)
        except Exception as e:  # cost analysis can be backend-dependent
            row["cost_analysis_error"] = f"{type(e).__name__}: {e}"
        results["rows"].append(row)
        print(json.dumps(row), flush=True)

    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
