"""Roofline accounting for the headline SeqPAN eval step.

Answers, with measurements rather than guesses, "how close is the step to
this chip's ceiling at these dims?":

1. **Achieved HBM bandwidth** — a streaming saxpy sweep (the same
   fori-loop + byte-fetch protocol as bench.py) establishes what this chip
   actually sustains, independent of spec sheets.
2. **Kernel-launch floor** — a chain of data-dependent trivial kernels
   measures the per-kernel dispatch overhead of the sequential-chain regime
   the model lives in.
3. **Step traffic** — the scheduled post-fusion HLO of the compiled eval
   step is parsed; every entry-computation instruction is one device kernel,
   and its operand+result bytes are the HBM round trips XLA actually
   scheduled (fusion internals live in VMEM and are excluded, unlike
   ``cost_analysis()['bytes accessed']`` which overcounts them).

The roofline for a memory-bound chain is then
    floor_ms = max(traffic / achieved_bw, kernels * launch_overhead)
and the report states measured/floor.  Writes docs/ROOFLINE.json.

Usage: python -m vmrframe_tpu.tools.roofline [--batches 128,512]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import time

import numpy as np

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))

_SHAPE_RE = re.compile(r"\b([a-z]+\d+|pred)\[([\d,]*)\]")
_BYTES = {"f32": 4, "s32": 4, "u32": 4, "bf16": 2, "f16": 2, "s16": 2,
          "u16": 2, "s8": 1, "u8": 1, "pred": 1, "f64": 8, "s64": 8,
          "u64": 8, "c64": 8, "c128": 16}
# entry-level opcodes that do not dispatch a device kernel
_FREE_OPS = {"parameter", "constant", "get-tuple-element", "tuple", "bitcast",
             "after-all", "partition-id", "replica-id"}


def _shape_bytes(m) -> int:
    dtype, dims = m.group(1), m.group(2)
    if dtype not in _BYTES:
        return 0
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * _BYTES[dtype]


def parse_entry_traffic(hlo_text: str):
    """(kernel_count, traffic_bytes) from the scheduled module's ENTRY block.

    Each non-free entry instruction = one kernel.  Its writes are its result
    shape; its reads are its operands' result shapes, resolved through a
    name->bytes symbol table (the scheduled printer does not annotate operand
    shapes inline)."""
    entry = hlo_text[hlo_text.index("\nENTRY "):]
    entry = entry[:entry.index("\n}")]

    defs = {}  # name -> (bytes, opcode)
    parsed = []
    for line in entry.splitlines():
        line = line.strip()
        m = re.match(r"%?([\w.\-]+) = (\(?)(.*)", line)
        if not m:
            continue
        name, rest = m.group(1), m.group(2) + m.group(3)
        out_bytes = sum(_shape_bytes(s) for s in
                        _SHAPE_RE.finditer(rest.split(" ", 1)[0])
                        ) if not rest.startswith("(") else sum(
            _shape_bytes(s) for s in _SHAPE_RE.finditer(rest[:rest.index(")") + 1]))
        body = rest[rest.index(")") + 1:] if rest.startswith("(") else rest
        op_m = re.search(r"(?:^|\s)([\w\-]+)\(", body)
        opcode = op_m.group(1) if op_m else ""
        args_start = body.find("(")
        operands = re.findall(r"%([\w.\-]+)", body[args_start:]) if args_start >= 0 else []
        defs[name] = (out_bytes, opcode)
        parsed.append((name, out_bytes, opcode, operands))

    kernels, traffic = 0, 0
    for name, out_bytes, opcode, operands in parsed:
        if opcode in _FREE_OPS or not opcode:
            continue
        kernels += 1
        if opcode in ("slice", "dynamic-slice", "gather"):
            # reads only the sliced region ~= the output
            traffic += 2 * out_bytes
            continue
        if opcode == "dynamic-update-slice":
            # in-place: reads the update operand, writes its region
            upd = defs.get(operands[1], (0, ""))[0] if len(operands) > 1 else 0
            traffic += 2 * upd
            continue
        traffic += out_bytes
        for op in operands:
            ob, oop = defs.get(op, (0, ""))
            if oop == "constant" and ob <= 64:
                continue  # scalar immediates
            if oop == "broadcast" and ob > 0:
                # broadcasts of small things: charge the source, not the
                # inflated logical shape (XLA reads the small source)
                ob = min(ob, out_bytes)
            traffic += ob
    return kernels, traffic


def _timed_loop(body, args, n_small, n_big, reps=3):
    import jax
    import jax.numpy as jnp

    def make(n):
        @jax.jit
        def loop(*a):
            def b(i, acc):
                return body(i, acc, *a)
            return jax.lax.fori_loop(0, n, b, jnp.float32(0.0))
        return loop

    def t(n):
        fn = make(n)
        np.asarray(fn(*args))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(fn(*args))
            best = min(best, time.perf_counter() - t0)
        return best

    return (t(n_big) - t(n_small)) / (n_big - n_small)


def measure_hbm_bw():
    """Best sustained GB/s over a streaming-read size sweep.

    The body sums (x + i) — i-dependence defeats hoisting, and the fused
    add+reduce streams x from HBM exactly once per iteration with no
    writeback, so traffic = len(x)*4 reads.  (A naive saxpy whose result is
    only partially consumed gets DCE'd to a scalar — measured 618 TB/s.)"""
    import jax
    import jax.numpy as jnp

    best = 0.0
    for mb in (64, 256, 512):
        n = mb * 1024 * 1024 // 4
        x = jnp.ones((n,), jnp.float32)

        def body(i, acc, x):
            return acc + jnp.sum(x + i.astype(jnp.float32)) * 1e-12

        sec = _timed_loop(body, (x,), 5, 25)
        gbs = n * 4 / sec / 1e9
        best = max(best, gbs)
    return best


def measure_launch_overhead():
    """Per-kernel dispatch cost: a chain of data-dependent 1-element rsqrt
    kernels (too small for compute/memory time to register)."""
    import jax
    import jax.numpy as jnp

    x = jnp.float32(2.0)

    def body(i, acc, x):
        v = x + acc
        for _ in range(16):
            v = jax.lax.rsqrt(v) + jnp.float32(1.0)
            v = jax.lax.stop_gradient(jax.lax.optimization_barrier(v))
        return v

    sec = _timed_loop(body, (x,), 20, 120)
    return sec / 16


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="128,512")
    ap.add_argument("--save-hlo", action="store_true",
                    help="dump the scheduled HLO to docs/hlo_eval_B<N>.txt")
    ap.add_argument("--out", default=os.path.join(REPO, "docs", "ROOFLINE.json"))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _build, _make_cfg

    report = {"device": str(jax.devices()[0])}
    report["hbm_gbs_measured"] = round(measure_hbm_bw(), 1)
    report["launch_overhead_us"] = round(measure_launch_overhead() * 1e6, 3)
    print(json.dumps({k: v for k, v in report.items() if k != "rows"}), flush=True)

    rows = []
    for B in [int(b) for b in args.batches.split(",")]:
        cfg = _make_cfg(batch_size=B)
        model, entry, derived, batch, _ = _build(cfg, batch_size=B)
        rng = jax.random.PRNGKey(0)
        variables = model.init({"params": rng, "dropout": rng, "gumbel": rng},
                               batch, True)

        def to_bf16(tree):
            return jax.tree_util.tree_map(
                lambda x: x.astype(jnp.bfloat16)
                if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
                else x, tree)

        dev = jax.devices()[0]
        vb = to_bf16(jax.device_put(variables, dev))
        bb = to_bf16(jax.device_put(batch, dev))

        def fwd_infer(i, acc, variables, batch):
            b = dict(batch)
            b["vfeats"] = jnp.roll(batch["vfeats"], i, axis=1) + acc * 1e-9
            out = model.apply(variables, b, True)
            o32 = jax.tree_util.tree_map(
                lambda x: x.astype(jnp.float32)
                if hasattr(x, "dtype") and x.dtype == jnp.bfloat16 else x, out)
            props = entry.infer_fn(o32, batch, cfg)
            return acc + jnp.sum(props)

        ns, nb = (50, 450) if B <= 256 else (20, 120)
        step_ms = _timed_loop(fwd_infer, (vb, bb), ns, nb) * 1e3

        @jax.jit
        def one(variables, batch):
            return fwd_infer(jnp.int32(1), jnp.float32(0.0), variables, batch)

        hlo = one.lower(vb, bb).compile().as_text()
        if args.save_hlo:
            with open(os.path.join(REPO, "docs", f"hlo_eval_B{B}.txt"), "w") as f:
                f.write(hlo)
        kernels, traffic = parse_entry_traffic(hlo)
        bw_floor_ms = traffic / (report["hbm_gbs_measured"] * 1e9) * 1e3
        launch_floor_ms = kernels * report["launch_overhead_us"] / 1e3
        floor_ms = max(bw_floor_ms, launch_floor_ms)
        rows.append({
            "batch": B,
            "measured_ms": round(step_ms, 4),
            "kernels": kernels,
            "traffic_mb": round(traffic / 1e6, 1),
            "bw_floor_ms": round(bw_floor_ms, 4),
            "launch_floor_ms": round(launch_floor_ms, 4),
            "floor_ms": round(floor_ms, 4),
            "pct_of_ceiling": round(100.0 * floor_ms / step_ms, 1),
            "qps": round(B / step_ms * 1e3, 1),
        })
        print(json.dumps(rows[-1]), flush=True)

    report["rows"] = rows
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
