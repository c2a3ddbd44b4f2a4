"""Trace-grounded roofline: per-op floors from a real device trace.

Reads a docs/TRACE_*.json produced by tools/trace_profile.py (per-HLO
device times with achieved GB/s and TFLOP/s) and computes, for every op in
the steady-state step, the fastest time that op could possibly take on this
chip given its bytes and FLOPs and the MEASURED isolated op-type rates
(docs/ROOFLINE.json probes + the round-3 isolation measurements recorded in
BASELINE.md/ROADMAP.md):

- matmul-bearing fusions: max(flops / MXU bf16 peak, bytes / elementwise
  chain rate) — the MXU peak is the silicon number (v5e: 197 TFLOP/s bf16),
  the byte floor uses the measured on-chip fused-chain rate (~11 TB/s at
  the modal 2-4 MB buffer size, docs/ROOFLINE.json chain_probe);
- layout/"data formatting" copies: bytes / measured isolated permute rate
  (300 GB/s — the TOP of the measured 150-300 GB/s range, i.e. generous);
- reduce fusions (LayerNorm-style convert+reduce): measured isolated floor
  == their achieved time (round 3 measured isolated LN at the same ~10 us
  the in-program fusions take; ROADMAP.md), so floor = achieved;
- pure elementwise loop fusions: bytes / chain rate.

Two composite floors come out:

- ``floor_realizable_ms``: every op of the best-known program at its
  isolated floor rate.  The copies are COUNTED: the only known
  copy-eliminating formulation (per-head lane-slice dots) measured SLOWER
  end-to-end (1222 us vs 945 us, ROADMAP.md), so a floor that drops them
  describes no realizable program.
- ``floor_no_copies_ms``: the hypothetical with all data-formatting time
  removed — the round-3 BASELINE.md "0.55-0.6 ms" construction, kept for
  continuity.

Train-step extension (round 5): the eval floor model assumed every fusion's
bytes can stream at the small-buffer chain rate (11 TB/s, measured at the
eval step's modal 2-4 MB buffers).  Train steps carry 50-200 MB residual
fusions that CANNOT reach that rate — the best large-fusion rate any trace
has ever measured here is ~1.5 TB/s (docs/TRACE_SEQPAN_TRAIN.json
fusion.6013), and the round-3 whole-body effective-bandwidth ceiling is
1.7 TB/s — so the train floor model (``--floors train``, auto-selected for
TRAIN traces) uses a size-aware byte rate: 11 TB/s for ops moving <=16 MB
per step, 1.7 TB/s above.  It also floors the train-only categories: DMA
copies (copy-done/async-done/concatenate) at the 819 GB/s HBM peak,
rng-bit-generator at achieved (a generator's cost IS its output bytes; no
measured faster rate exists), and output fusions by their FLOPs like any
matmul-bearing fusion.

Usage: python -m vmrframe_tpu.tools.roofline_trace [--trace docs/TRACE_EVAL_B128.json]
         [--floors auto|eval|train] [--out ...]
       python -m vmrframe_tpu.tools.roofline_trace --train-set T1.json,T2.json
         (decomposes each, writes one combined docs/ROOFLINE_TRACE_TRAIN.json)
Writes docs/ROOFLINE_TRACE.json and prints a summary.
"""

from __future__ import annotations

import argparse
import json
import os

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))

MXU_BF16_TFLOPS = 197.0     # v5e peak (2 MXUs, bf16)
CHAIN_TBS = 11.0            # measured fused elementwise-chain rate (ROOFLINE.json)
LARGE_CHAIN_TBS = 1.7       # measured whole-body effective-bandwidth ceiling
                            # (round 3); no single >16MB fusion has measured
                            # above ~1.5 TB/s in any trace here
LARGE_BYTES = 16e6          # per-step bytes above which the 11 TB/s small-
                            # buffer rate is unreachable (VMEM-residency limit)
PERMUTE_GBS = 300.0         # top of the measured isolated permute-rate range
HBM_GBS = 819.0             # v5e HBM peak — floor for DMA copies/concats
MATMUL_TFLOPS_MIN = 0.5     # fusions above this are counted as matmul-bearing


def classify(row):
    cat = row["category"]
    name = row["name"]
    if cat == "data formatting" or name.startswith(("copy", "transpose", "bitcast")):
        return "copy"
    # LayerNorm-style stats fusions only: a reduce-NAMED convolution fusion
    # is MXU work and must get the matmul floor, not floor=achieved (the
    # round-3 version floored 179 us of matmul-bearing fusions at 100% of
    # achieved, inflating the realizable floor).
    if cat == "loop fusion" and "reduce" in name:
        return "reduce"
    if row.get("tflops", 0.0) >= MATMUL_TFLOPS_MIN and cat == "convolution fusion":
        return "matmul"
    return "elementwise"


def classify_train(row):
    """Train traces carry categories the eval step never shows: async DMA
    pairs, grad-accumulation output fusions, optimizer ravel concats, rng."""
    cat = row["category"]
    name = row["name"]
    if cat in ("copy-done", "async-done", "copy-start", "async-start",
               "concatenate", "dynamic-update-slice"):
        return "dma"
    if cat == "rng-bit-generator":
        return "rng"
    if cat == "data formatting" or name.startswith(("copy", "transpose", "bitcast")):
        return "copy"
    if cat == "loop fusion" and "reduce" in name:
        return "reduce"
    if (row.get("tflops", 0.0) >= MATMUL_TFLOPS_MIN
            and cat in ("convolution fusion", "output fusion")):
        return "matmul"
    return "elementwise"


def _byte_rate_tbs(bytes_gb):
    """Size-aware generous byte-stream ceiling (see module docstring)."""
    return CHAIN_TBS if bytes_gb * 1e9 <= LARGE_BYTES else LARGE_CHAIN_TBS


def decompose(trace_path: str, floors: str = "auto"):
    d = json.load(open(trace_path))
    # the outer while op's own duration IS the wall time of one step; the
    # per-op durations below overlap on device (async DMA + compute run
    # concurrently), so their sum overshoots wall — train steps measure
    # ~2x.  Floors are compared against BOTH: vs op-sum says how far each
    # op is from its own silicon limit; vs wall says how much end-to-end
    # headroom exists if overlap stayed perfect.
    wall_us = max((r["us_per_iter"] for r in d["rows"] if r["category"] == "while"),
                  default=None)
    rows = [r for r in d["rows"] if r["category"] != "while"]
    if not any(r["us_per_iter"] > 0 for r in rows):
        raise SystemExit(f"no usable device rows in {trace_path} "
                         "(all us_per_iter <= 0 or only 'while' rows)")
    if floors == "auto":
        floors = "train" if "TRAIN" in os.path.basename(trace_path).upper() else "eval"
    cls = classify_train if floors == "train" else classify

    agg = {}
    top_headroom = []
    for r in rows:
        us = r["us_per_iter"]
        if us <= 0:
            continue
        kind = cls(r)
        # prefer raw per-iter bytes/flops when the trace carries them;
        # fall back to reconstructing from the rounded gbps/tflops rates
        if "bytes_per_iter" in r:
            bytes_gb = r["bytes_per_iter"] / 1e9
        else:
            bytes_gb = r.get("gbps", 0.0) * us * 1e-6  # GB/s * s = GB
        if "flops_per_iter" in r:
            flops_t = r["flops_per_iter"] / 1e12
        else:
            flops_t = r.get("tflops", 0.0) * us * 1e-6      # TFLOP
        chain = _byte_rate_tbs(bytes_gb) if floors == "train" else CHAIN_TBS
        if kind == "matmul":
            floor = max(flops_t / MXU_BF16_TFLOPS,
                        bytes_gb / (chain * 1000.0)) * 1e6
        elif kind == "copy":
            floor = bytes_gb / PERMUTE_GBS * 1e6
        elif kind == "dma":
            floor = bytes_gb / HBM_GBS * 1e6
        elif kind in ("reduce", "rng"):
            floor = us  # measured at its isolated floor already
        else:
            floor = bytes_gb / (chain * 1000.0) * 1e6
        floor = min(floor, us)  # an op can't beat its own measurement
        e = agg.setdefault(kind, {"us": 0.0, "floor_us": 0.0, "n": 0,
                                  "gb": 0.0, "tflop": 0.0})
        e["us"] += us
        e["floor_us"] += floor
        e["n"] += 1
        e["gb"] += bytes_gb
        e["tflop"] += flops_t
        if us - floor > 5.0:  # the actionable list: biggest single-op gaps
            top_headroom.append({
                "name": r["name"], "kind": kind, "us": round(us, 1),
                "floor_us": round(floor, 1), "gb": round(bytes_gb, 4),
                "source": r.get("source", "")})

    measured_us = sum(e["us"] for e in agg.values())
    floor_real = sum(e["floor_us"] for e in agg.values())
    copies = (agg.get("copy", {"floor_us": 0.0})["floor_us"]
              + agg.get("dma", {"floor_us": 0.0})["floor_us"])
    floor_nocopy = floor_real - copies
    top_headroom.sort(key=lambda x: -(x["us"] - x["floor_us"]))

    return {
        "trace": os.path.basename(trace_path),
        "floor_model": floors,
        "rates": {"mxu_bf16_tflops": MXU_BF16_TFLOPS, "chain_tbs": CHAIN_TBS,
                  "large_chain_tbs": LARGE_CHAIN_TBS, "large_bytes": LARGE_BYTES,
                  "permute_gbs": PERMUTE_GBS, "hbm_gbs": HBM_GBS},
        "by_kind": {k: {kk: round(vv, 3) if isinstance(vv, float) else vv
                        for kk, vv in v.items()} for k, v in sorted(agg.items())},
        "measured_op_sum_us_per_step": round(measured_us, 1),
        "wall_us_per_step": round(wall_us, 1) if wall_us else None,
        "floor_realizable_us": round(floor_real, 1),
        "floor_no_copies_us": round(floor_nocopy, 1),
        "floor_pct_of_op_sum": round(100.0 * floor_real / measured_us, 1),
        "floor_pct_of_wall": (round(100.0 * floor_real / wall_us, 1)
                              if wall_us else None),
        "top_headroom_ops": top_headroom[:12],
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace", default=os.path.join(REPO, "docs", "TRACE_EVAL_B128.json"))
    ap.add_argument("--floors", default="auto", choices=["auto", "eval", "train"])
    ap.add_argument("--train-set", default=None,
                    help="comma-separated TRAIN traces; writes one combined "
                         "docs/ROOFLINE_TRACE_TRAIN.json keyed by trace")
    ap.add_argument("--out", default=None)
    a = ap.parse_args()

    if a.train_set:
        out_path = a.out or os.path.join(REPO, "docs", "ROOFLINE_TRACE_TRAIN.json")
        combined = {}
        for p in a.train_set.split(","):
            p = p.strip()
            res = decompose(p, floors="train")
            combined[os.path.basename(p)] = res
            print(json.dumps({res["trace"]: {
                "op_sum_us": res["measured_op_sum_us_per_step"],
                "wall_us": res["wall_us_per_step"],
                "floor_realizable_us": res["floor_realizable_us"],
                "floor_pct_of_wall": res["floor_pct_of_wall"],
                "by_kind_us": {k: v["us"] for k, v in res["by_kind"].items()},
            }}, indent=1), flush=True)
        with open(out_path, "w") as f:
            json.dump(combined, f, indent=1)
        return

    out_path = a.out or os.path.join(REPO, "docs", "ROOFLINE_TRACE.json")
    out = decompose(a.trace, floors=a.floors)
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
