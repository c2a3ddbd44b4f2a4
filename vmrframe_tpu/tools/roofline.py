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

# a shape with its layout suffix, e.g. f32[128,64]{0,1:T(8,128)S(1)} —
# group 3 captures the {...} so memory space S(1) (VMEM-resident on TPU:
# never round-trips HBM) can be recognised and excluded from traffic
_SHAPE_RE = re.compile(r"\b([a-z]+\d+|pred)\[([\d,]*)\](\{[^}]*\})?")
_BYTES = {"f32": 4, "s32": 4, "u32": 4, "bf16": 2, "f16": 2, "s16": 2,
          "u16": 2, "s8": 1, "u8": 1, "pred": 1, "f64": 8, "s64": 8,
          "u64": 8, "c64": 8, "c128": 16}
# opcodes that do not dispatch a device kernel: metadata/aliasing ops, and
# the completion halves of async pairs (the -start carries the transfer)
_FREE_OPS = {"parameter", "constant", "get-tuple-element", "tuple", "bitcast",
             "after-all", "partition-id", "replica-id",
             "copy-done", "async-done", "send-done", "recv-done"}


def _shape_bytes(m, hbm_only: bool = True) -> int:
    dtype, dims, layout = m.group(1), m.group(2), m.group(3) or ""
    if dtype not in _BYTES:
        return 0
    if hbm_only and "S(" in layout:
        return 0  # alternate memory space (VMEM scratch) — no HBM traffic
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * _BYTES[dtype]


def _result_type_bytes(rest: str) -> int:
    """HBM bytes of an instruction's result type, which is the text before
    the opcode: either one shape or a parenthesised tuple of shapes (with
    balanced parens inside layout annotations like S(1) / T(8,128))."""
    if not rest.startswith("("):
        return sum(_shape_bytes(s) for s in
                   _SHAPE_RE.finditer(rest.split(" ", 1)[0]))
    depth, end = 0, 0
    for i, c in enumerate(rest):
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                end = i
                break
    return sum(_shape_bytes(s) for s in _SHAPE_RE.finditer(rest[:end + 1]))


def _split_type_and_body(rest: str):
    """(result_type_text, remainder) with balanced-paren tuple handling."""
    if not rest.startswith("("):
        sp = rest.find(" ")
        return rest[:sp], rest[sp + 1:]
    depth = 0
    for i, c in enumerate(rest):
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                return rest[:i + 1], rest[i + 1:]
    return rest, ""


def find_steady_body(hlo_text: str) -> str:
    """The computation text of the LARGEST while-loop body in the module —
    the steady-state per-iteration program that bench.py's marginal-time
    protocol measures.  (The ENTRY block additionally contains one-time
    work: parameter layout conversion copies of every weight, H2D staging,
    result fetch — charging those per-step overcounts by >2x, measured.)"""
    best = ""
    for m in re.finditer(r"body=%?([\w.\-]+)", hlo_text):
        name = m.group(1)
        i = hlo_text.find("%" + name + " ")
        if i < 0:
            continue
        blk = hlo_text[i:]
        blk = blk[:blk.index("\n}")]
        if len(blk) > len(best):
            best = blk
    if not best:
        raise ValueError("no while body found in HLO")
    return best


def parse_entry_traffic(hlo_text: str, body: str | None = None):
    """(kernel_count, traffic_bytes) for one steady-state iteration.

    Each non-free instruction = one device kernel.  Its writes are its
    result shape; its reads are its operands' result shapes, resolved
    through a name->bytes symbol table (the scheduled printer does not
    annotate operand shapes inline).  copy-start/copy-done pairs are ONE
    copy (start carries the cost, done is the completion token)."""
    entry = body if body is not None else find_steady_body(hlo_text)

    defs = {}  # name -> (bytes, opcode)
    parsed = []
    for line in entry.splitlines():
        line = line.strip()
        m = re.match(r"%?([\w.\-]+) = (\(?)(.*)", line)
        if not m:
            continue
        name, rest = m.group(1), m.group(2) + m.group(3)
        type_text, body = _split_type_and_body(rest)
        out_bytes = _result_type_bytes(rest)
        all_out = sum(_shape_bytes(s, hbm_only=False)
                      for s in _SHAPE_RE.finditer(type_text))
        op_m = re.match(r"\s*([\w\-]+)\(", body)
        opcode = op_m.group(1) if op_m else ""
        args_start = body.find("(")
        args_end = body.find(")", args_start)
        operands = (re.findall(r"%([\w.\-]+)", body[args_start:args_end])
                    if args_start >= 0 else [])
        defs[name] = (out_bytes, all_out, opcode)
        parsed.append((name, out_bytes, all_out, opcode, operands))

    kernels, traffic, per_kernel = 0, 0, []
    for name, out_bytes, all_out, opcode, operands in parsed:
        if opcode in _FREE_OPS or not opcode:
            continue
        kernels += 1
        if opcode in ("slice", "dynamic-slice", "gather"):
            # reads only the sliced region ~= the output
            traffic += 2 * out_bytes
            per_kernel.append((2 * out_bytes, 2 * all_out))
            continue
        if opcode == "dynamic-update-slice":
            # in-place: reads the update operand, writes its region
            upd = defs.get(operands[1], (0, 0, ""))[0] if len(operands) > 1 else 0
            traffic += 2 * upd
            per_kernel.append((2 * upd, 2 * upd))
            continue
        hbm_k, all_k = out_bytes, all_out
        for op in operands:
            ob, oab, oop = defs.get(op, (0, 0, ""))
            if oop == "constant" and ob <= 64:
                continue  # scalar immediates
            if oop == "broadcast" and ob > 0:
                # broadcasts of small things: charge the source, not the
                # inflated logical shape (XLA reads the small source)
                ob = min(ob, out_bytes)
                oab = min(oab, all_out)
            hbm_k += ob
            all_k += oab
        traffic += hbm_k
        per_kernel.append((hbm_k, all_k))
    return kernels, traffic, per_kernel


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

    sec = _timed_loop(body, (x,), 50, 1050)
    return sec / 16


def measure_chain_bw():
    """Effective per-kernel byte throughput of a SERIALIZED chain of
    data-dependent elementwise kernels at the model's activation sizes —
    the regime the eval step actually lives in (each kernel reads its
    predecessor's output; buffers this size are VMEM-prefetchable, so the
    ceiling is VMEM/VPU throughput, far below one-shot HBM streaming but
    far above the 1-element launch floor).  Returns (GB/s, per_kernel_us)
    at the best-fitting size."""
    import jax
    import jax.numpy as jnp

    def timed_chain(n_ops, x0):
        def body(i, acc, x0):
            # roll defeats loop-invariant hoisting (i-dependence must NOT go
            # through a bf16 scalar: 1 + acc*eps rounds back to exactly 1.0
            # and the whole chain hoists — measured)
            v = jnp.roll(x0, i, axis=0)
            for _ in range(n_ops):
                v = v * jnp.bfloat16(1.0001) + jnp.bfloat16(0.0001)
                v = jax.lax.optimization_barrier(v)
            # full reduction: every element is live, nothing DCEs
            return acc + jnp.sum(v.astype(jnp.float32)) * 1e-12

        return _timed_loop(body, (x0,), 50, 1050)

    results = {}
    for mb2 in (1, 2, 3, 4):  # bf16[128,64,128] = 2.1 MB is the modal buffer
        n = mb2 * 1024 * 1024 // 2
        x0 = jnp.ones((n,), jnp.bfloat16)
        # difference two chain lengths at the same buffer size: the setup,
        # reduction and loop plumbing cancel, leaving 16 chained kernels;
        # best-of-3 outer reps against tunnel jitter
        sec = min((timed_chain(24, x0) - timed_chain(8, x0)) / 16
                  for _ in range(3))
        # sanity: per-op below 0.2 us means the diff drowned in jitter
        if sec < 0.2e-6:
            results[mb2] = (float("nan"), sec * 1e6)
            continue
        # each kernel reads + writes the buffer once
        results[mb2] = (2 * n * 2 / sec / 1e9, sec * 1e6)
    valid = [v for v in results.values() if v[0] == v[0]]
    # max GB/s among valid points = the most conservative (lowest) floor
    best = max(valid) if valid else (float("nan"), 0.0)
    return best, {f"{k}MB": (round(v[0], 1), round(v[1], 3))
                  for k, v in results.items()}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="128,512")
    ap.add_argument("--chunk", type=int, default=0,
                    help="apply chunked_batch_apply tiling (0 = off)")
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
    (chain_gbs, _), chain_detail = measure_chain_bw()
    report["chain_gbs_measured"] = round(chain_gbs, 1)
    report["chain_probe"] = chain_detail
    print(json.dumps({k: v for k, v in report.items() if k != "rows"}), flush=True)

    rows = []
    for B in [int(b) for b in args.batches.split(",")]:
        cfg = _make_cfg(batch_size=B)
        model, entry, derived, batch, _ = _build(cfg, batch_size=B)
        rng = jax.random.PRNGKey(0)
        variables = model.init({"params": rng, "dropout": rng, "gumbel": rng},
                               batch, True)

        from vmrframe_tpu.ops.precision import cast_floating

        def to_bf16(tree):
            # vector-param policy: rank<=1 params stay f32 (ops/precision.py)
            return cast_floating(tree, jnp.bfloat16)

        dev = jax.devices()[0]
        vb = to_bf16(jax.device_put(variables, dev))
        bb = to_bf16(jax.device_put(batch, dev))

        from vmrframe_tpu.ops.chunked import chunked_batch_apply

        def fwd_infer(i, acc, variables, batch):
            b = dict(batch)
            # keep the perturbation in vfeats' own dtype: acc is f32, and
            # bf16 + f32 silently promotes the WHOLE forward to f32 (the
            # round-3 541-kernel census was of that accidental f32 program)
            v = batch["vfeats"]
            b["vfeats"] = jnp.roll(v, i, axis=1) + (acc * 1e-9).astype(v.dtype)

            def one_chunk(bc):
                out = model.apply(variables, bc, True)
                o32 = jax.tree_util.tree_map(
                    lambda x: x.astype(jnp.float32)
                    if hasattr(x, "dtype") and x.dtype == jnp.bfloat16 else x, out)
                return entry.infer_fn(o32, bc, cfg)

            props = (chunked_batch_apply(one_chunk, b, B, args.chunk)
                     if args.chunk else one_chunk(b))
            return acc + jnp.sum(props)

        ns, nb = (50, 450) if B <= 256 else (20, 120)
        step_ms = _timed_loop(fwd_infer, (vb, bb), ns, nb) * 1e3

        # the STEADY-STATE program: the same fori_loop bench.py times; its
        # while body is what executes once per marginal iteration
        @jax.jit
        def looped(variables, batch):
            def b(i, acc):
                return fwd_infer(i, acc, variables, batch)
            return jax.lax.fori_loop(0, 8, b, jnp.float32(0.0))

        hlo = looped.lower(vb, bb).compile().as_text()
        if args.save_hlo:
            with open(os.path.join(REPO, "docs", f"hlo_eval_B{B}.txt"), "w") as f:
                f.write(hlo)
        kernels, traffic, per_kernel = parse_entry_traffic(hlo)
        bw_floor_ms = traffic / (report["hbm_gbs_measured"] * 1e9) * 1e3
        launch_floor_ms = kernels * report["launch_overhead_us"] / 1e3
        # serialized-chain floor: the kernels form a dependence chain (the
        # acc feedback forbids cross-iteration overlap); each kernel costs
        # at least max(dispatch, its HBM bytes at streaming bw, its total
        # buffer bytes at the measured chained-elementwise throughput)
        launch_s = report["launch_overhead_us"] * 1e-6
        hbm_bw = report["hbm_gbs_measured"] * 1e9
        chain_bw = report["chain_gbs_measured"] * 1e9
        chain_floor_ms = sum(
            max(launch_s, hk / hbm_bw, ak / chain_bw)
            for hk, ak in per_kernel) * 1e3
        floor_ms = max(bw_floor_ms, launch_floor_ms, chain_floor_ms)
        rows.append({
            "batch": B,
            "measured_ms": round(step_ms, 4),
            "kernels": kernels,
            "hbm_traffic_mb": round(traffic / 1e6, 1),
            "all_buffer_mb": round(sum(a for _, a in per_kernel) / 1e6, 1),
            "bw_floor_ms": round(bw_floor_ms, 4),
            "launch_floor_ms": round(launch_floor_ms, 4),
            "chain_floor_ms": round(chain_floor_ms, 4),
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
