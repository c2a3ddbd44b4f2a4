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

Usage: python -m vmrframe_tpu.tools.roofline_trace [--trace docs/TRACE_EVAL_B128.json]
Writes docs/ROOFLINE_TRACE.json and prints a summary.
"""

from __future__ import annotations

import argparse
import json
import os

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))

MXU_BF16_TFLOPS = 197.0     # v5e peak (2 MXUs, bf16)
CHAIN_TBS = 11.0            # measured fused elementwise-chain rate (ROOFLINE.json)
PERMUTE_GBS = 300.0         # top of the measured isolated permute-rate range
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace", default=os.path.join(REPO, "docs", "TRACE_EVAL_B128.json"))
    ap.add_argument("--out", default=os.path.join(REPO, "docs", "ROOFLINE_TRACE.json"))
    a = ap.parse_args()

    d = json.load(open(a.trace))
    rows = [r for r in d["rows"] if r["category"] != "while"]
    if not any(r["us_per_iter"] > 0 for r in rows):
        raise SystemExit(f"no usable device rows in {a.trace} "
                         "(all us_per_iter <= 0 or only 'while' rows)")

    agg = {}
    for r in rows:
        us = r["us_per_iter"]
        if us <= 0:
            continue
        kind = classify(r)
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
        if kind == "matmul":
            floor = max(flops_t / MXU_BF16_TFLOPS,
                        bytes_gb / (CHAIN_TBS * 1000.0)) * 1e6
        elif kind == "copy":
            floor = bytes_gb / PERMUTE_GBS * 1e6
        elif kind == "reduce":
            floor = us  # measured at its isolated floor already
        else:
            floor = bytes_gb / (CHAIN_TBS * 1000.0) * 1e6
        e = agg.setdefault(kind, {"us": 0.0, "floor_us": 0.0, "n": 0,
                                  "gb": 0.0, "tflop": 0.0})
        e["us"] += us
        e["floor_us"] += min(floor, us)  # an op can't beat its own measurement
        e["n"] += 1
        e["gb"] += bytes_gb
        e["tflop"] += flops_t

    measured_us = sum(e["us"] for e in agg.values())
    floor_real = sum(e["floor_us"] for e in agg.values())
    floor_nocopy = floor_real - agg.get("copy", {"floor_us": 0.0})["floor_us"]

    out = {
        "trace": os.path.basename(a.trace),
        "rates": {"mxu_bf16_tflops": MXU_BF16_TFLOPS, "chain_tbs": CHAIN_TBS,
                  "permute_gbs": PERMUTE_GBS},
        "by_kind": {k: {kk: round(vv, 3) if isinstance(vv, float) else vv
                        for kk, vv in v.items()} for k, v in sorted(agg.items())},
        "measured_us_per_step": round(measured_us, 1),
        "floor_realizable_us": round(floor_real, 1),
        "floor_no_copies_us": round(floor_nocopy, 1),
        "achieved_pct_of_realizable_floor": round(100.0 * floor_real / measured_us, 1),
        "achieved_pct_of_no_copy_floor": round(100.0 * floor_nocopy / measured_us, 1),
    }
    with open(a.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
