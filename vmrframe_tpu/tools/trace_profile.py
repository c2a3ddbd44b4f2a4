"""Per-kernel device-time profile of the headline eval loop, from a REAL
TPU trace.

Rounds 1-2 worked blind: ``block_until_ready`` acks early through the
tunnel, so all optimization targeting came from bisection (sub-model
timing) and steady-state HLO schedule parses.  Round 3 found that
``jax.profiler.trace`` DOES capture device-side events here — every HLO
instruction inside the while-body gets a ``device_duration_ps`` plus its
bytes, FLOPs and source line.  This tool runs bench.py's exact fori-loop
eval program under the profiler and aggregates per-op device time, giving
ground truth for where the step's milliseconds actually go.

Usage:
  python -m vmrframe_tpu.tools.trace_profile [--batch 128] [--iters 50]
                                             [--mode eval|train]
Writes docs/TRACE_EVAL_B<batch>.json and prints the top sinks.
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import re
from collections import defaultdict

import numpy as np

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))


def build_eval_loop(batch_size: int, chunk: int = 256):
    """bench.py's exact measured program: model fwd + infer inside fori."""
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _build, _make_cfg
    from vmrframe_tpu.ops.chunked import chunked_batch_apply
    from vmrframe_tpu.ops.precision import cast_floating

    cfg = _make_cfg(batch_size=batch_size)
    model, entry, derived, batch, _ = _build(cfg, batch_size=batch_size)
    rng = jax.random.PRNGKey(0)
    variables = model.init({"params": rng, "dropout": rng, "gumbel": rng}, batch, True)
    device = jax.devices()[0]
    vb = cast_floating(jax.device_put(variables, device), jnp.bfloat16)
    bb = cast_floating(jax.device_put(batch, device), jnp.bfloat16)

    @jax.jit
    def loop(variables, batch, n):
        def fwd_infer(b):
            out = model.apply(variables, b, True)
            o32 = jax.tree_util.tree_map(
                lambda x: x.astype(jnp.float32)
                if hasattr(x, "dtype") and x.dtype == jnp.bfloat16 else x, out)
            return entry.infer_fn(o32, b, cfg)

        def body(i, acc):
            b = dict(batch)
            v = batch["vfeats"]
            delta = (i.astype(jnp.float32) * 1e-6).astype(v.dtype)
            b["vfeats"] = v + delta
            for key in ("words_ids", "chars_ids"):
                if key in batch:
                    b[key] = jnp.roll(batch[key], i, axis=0)
            props = (chunked_batch_apply(fwd_infer, b, batch_size, chunk)
                     if chunk else fwd_infer(b))
            return acc + jnp.sum(props)
        return jax.lax.fori_loop(0, n, body, 0.0)

    return loop, vb, bb


def build_zoo_loop(model_name: str, mode: str, batch_size=None):
    """Any zoo family's production train/eval step inside a fori loop
    (the exact computation tools/profile_model.py times)."""
    import jax
    import jax.numpy as jnp

    from vmrframe_tpu.config import Derived, load_config
    from vmrframe_tpu.data.batcher import Batcher
    from vmrframe_tpu.registry import get_model_entry
    from vmrframe_tpu.testing import make_synthetic_data
    from vmrframe_tpu.train.trainer import Trainer
    from vmrframe_tpu.tools.bench_zoo import MODELS, _apply_overrides, _first_float_key

    path, overrides = MODELS[model_name]
    cfg = _apply_overrides(load_config(path), overrides)
    if batch_size:
        cfg = cfg.updated({"train.batch_size": batch_size})
    B = int(cfg.train.batch_size)
    dataset, store = make_synthetic_data(cfg, seed=0, n_train=2 * B, n_test=B)
    derived = Derived(num_words=dataset["n_words"], num_chars=dataset["n_chars"],
                      num_train_steps=1000, steps_per_epoch=10)
    entry = get_model_entry(cfg.model.name)
    batcher_cls = entry.batcher_cls or Batcher
    batch = next(batcher_cls(dataset["train_set"], store, cfg, derived, "train").epoch(seed=0))
    trainer = Trainer(cfg, derived, dataset["word_vector"])
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    step_rng = jax.random.key(0, impl=str(cfg.train.get("prng_impl", "rbg")))
    device_batch = trainer._shard_batch(batch)
    pkey = _first_float_key(device_batch)

    def perturb(b0, tok):
        b = dict(b0)
        b[pkey] = b0[pkey] + (tok * 1e-9).astype(b0[pkey].dtype)
        return b

    if mode == "train":
        @jax.jit
        def loop(st, batch, rng, n):
            def body(i, carry):
                s, tok = carry
                s2, metrics = trainer._train_step(s, perturb(batch, tok), rng)
                return (s2, metrics["loss"].astype(jnp.float32))
            _, tok = jax.lax.fori_loop(0, n, body, (st, jnp.float32(0.0)))
            return tok

        return (lambda v, b, n: loop(v, b, step_rng, n)), state, device_batch
    else:
        @jax.jit
        def loop(st, batch, n):
            def body(i, tok):
                metrics = trainer._eval_step(st, perturb(batch, tok))
                return jnp.sum(metrics["ious"]).astype(jnp.float32)
            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        return loop, state, device_batch


def capture(loop, vb, bb, iters: int, trace_dir: str):
    import jax

    np.asarray(loop(vb, bb, np.int32(iters)))  # compile + warm
    with jax.profiler.trace(trace_dir):
        np.asarray(loop(vb, bb, np.int32(iters)))
    paths = sorted(glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                             recursive=True), key=os.path.getmtime)
    if not paths:
        raise RuntimeError("no trace produced — profiler unsupported here?")
    with gzip.open(paths[-1]) as f:
        return json.load(f)


def aggregate(trace: dict, iters: int):
    """Sum device op durations (the 'XLA Ops' thread of the TPU pid)."""
    events = trace.get("traceEvents", [])
    dev_pids = {e["pid"] for e in events
                if e.get("ph") == "M" and e.get("name") == "process_name"
                and "TPU" in str(e.get("args", {}).get("name", ""))}
    op_tids = {(e["pid"], e["tid"]) for e in events
               if e.get("ph") == "M" and e.get("name") == "thread_name"
               and e["pid"] in dev_pids
               and e.get("args", {}).get("name") == "XLA Ops"}
    rows = defaultdict(lambda: {"us": 0.0, "count": 0, "bytes": 0, "flops": 0,
                                "category": "", "source": "", "example": ""})
    total_us = 0.0
    for e in events:
        if e.get("ph") != "X" or (e.get("pid"), e.get("tid")) not in op_tids:
            continue
        a = e.get("args", {})
        dur = float(a.get("device_duration_ps", 0)) / 1e6  # ps -> us
        name = e.get("name", "?")
        if name == "while":
            continue  # the outer loop op's duration covers every inner op
        r = rows[name]
        r["us"] += dur
        r["count"] += 1
        r["bytes"] += int(a.get("raw_bytes_accessed", a.get("bytes_accessed", 0)) or 0)
        r["flops"] += int(a.get("model_flops", 0) or 0)
        r["category"] = a.get("hlo_category", r["category"])
        if not r["source"]:
            r["source"] = (a.get("source_stack", "") or a.get("source", "")).split("\n")[0]
        if not r["example"]:
            r["example"] = a.get("long_name", "")[:200]
        total_us += dur
    out = []
    for name, r in rows.items():
        out.append({
            "name": name,
            "us_per_iter": round(r["us"] / iters, 3),
            "count_per_iter": round(r["count"] / iters, 2),
            "category": r["category"],
            "gbps": round(r["bytes"] / (r["us"] * 1e3), 1) if r["us"] else 0.0,
            "tflops": round(r["flops"] / (r["us"] * 1e6), 2) if r["us"] else 0.0,
            # raw per-iter counts so downstream floors (roofline_trace.py)
            # don't reconstruct bytes/FLOPs from the rounded rates above
            "bytes_per_iter": round(r["bytes"] / iters, 1),
            "flops_per_iter": round(r["flops"] / iters, 1),
            "source": r["source"],
            "example": r["example"],
        })
    out.sort(key=lambda r: -r["us_per_iter"])
    return out, total_us / iters


def by_category(rows):
    cats = defaultdict(float)
    for r in rows:
        cats[r["category"] or "?"] += r["us_per_iter"]
    return dict(sorted(cats.items(), key=lambda kv: -kv[1]))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--chunk", type=int, default=256)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--model", default=None,
                    help="zoo family (BAN/CCA/...); default: bench.py's SeqPAN loop")
    ap.add_argument("--mode", default="eval", choices=["eval", "train"])
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    if args.model:
        loop, vb, bb = build_zoo_loop(args.model, args.mode, args.batch)
        tag = f"{args.model.upper()}_{args.mode.upper()}"
    else:
        loop, vb, bb = build_eval_loop(args.batch or 128, args.chunk)
        tag = f"EVAL_B{args.batch or 128}"
    trace = capture(loop, vb, bb, args.iters, "/tmp/vmr_trace")
    rows, step_us = aggregate(trace, args.iters)
    cats = by_category(rows)

    print(f"device time per step: {step_us:.1f} us")
    print(f"{'us/iter':>8} {'cum%':>5} {'n':>5} {'category':<22} name / source")
    cum = 0.0
    for r in rows[: args.top]:
        cum += r["us_per_iter"]
        print(f"{r['us_per_iter']:8.2f} {100 * cum / step_us:5.1f} "
              f"{r['count_per_iter']:5.1f} {r['category']:<22} "
              f"{r['name'][:40]}")
        print(f"{'':14} {r['example'][:150]}")
    print("\nby category:")
    for c, us in cats.items():
        print(f"  {us:8.2f} us  {100 * us / step_us:5.1f}%  {c}")

    out = args.out or os.path.join(REPO, "docs", f"TRACE_{tag}.json")
    with open(out, "w") as f:
        json.dump({"tag": tag, "batch": args.batch, "iters": args.iters,
                   "device_us_per_step": round(step_us, 2),
                   "by_category_us": {k: round(v, 2) for k, v in cats.items()},
                   "rows": rows[:2000]}, f, indent=1)
    print(f"\nwrote {out}")


if __name__ == "__main__":
    main()
