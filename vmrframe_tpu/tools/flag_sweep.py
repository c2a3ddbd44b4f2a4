"""XLA compiler-flag sweep on the headline eval step.

The SeqPAN eval step is schedule-bound (docs/ROOFLINE.json: 541 steady-state
kernels moving 1.4 GB of buffer traffic at an effective 1.7 TB/s, vs a
~10 TB/s measured elementwise ceiling), so the remaining headroom lives in
XLA's fusion/scheduling decisions.  Those are steerable via XLA_FLAGS, which
must be set before backend init — so each candidate runs ``bench.py`` in a
fresh subprocess and we parse its one-line JSON.

Usage: python -m vmrframe_tpu.tools.flag_sweep [--batch 128] [--quick]
Writes docs/FLAG_SWEEP.json (sorted by qps, baseline first).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))

# Curated candidates: fusion sizing, loop optimization, scheduling.  Each
# entry is (label, flags-string appended to XLA_FLAGS).
CANDIDATES = [
    ("baseline", ""),
    ("mem_bound_loop", "--xla_tpu_memory_bound_loop_optimizer_options=enabled:true"),
    ("latency_hiding", "--xla_tpu_enable_latency_hiding_scheduler=true"),
    ("fusion_cost_model", "--xla_tpu_use_bundle_aware_cost_model_for_fusions=true"),
    ("nested_loop_fusion", "--xla_tpu_enable_multi_level_nested_loop_fusion=true"),
    ("dot_dot_fusion", "--xla_tpu_dot_dot_fusion=true"),
    ("no_rwb_fusion", "--xla_tpu_rwb_fusion=false"),
    ("scoped_vmem_96m", "--xla_tpu_scoped_vmem_limit_kib=98304"),
    ("flash_attn_sched", "--xla_tpu_enable_flash_attention=true"),
    ("async_fusion", "--xla_tpu_enable_async_collective_fusion=true"),
    ("licm_inflate", "--xla_tpu_licm_size_inflation_ratio=8"),
    ("vmem_to_scale", "--xla_tpu_scale_vmem_with_cores=true"),
]


def run_one(label: str, flags: str, batch: int, chunk: int):
    env = dict(os.environ)
    base = env.get("XLA_FLAGS", "")
    env["XLA_FLAGS"] = (base + " " + flags).strip()
    cmd = [sys.executable, os.path.join(REPO, "bench.py"),
           "--batch", str(batch), "--chunk", str(chunk)]
    try:
        out = subprocess.run(cmd, capture_output=True, text=True, timeout=900,
                             cwd=REPO, env=env)
    except subprocess.TimeoutExpired:
        return {"label": label, "flags": flags, "error": "timeout"}
    line = None
    for ln in out.stdout.splitlines():
        ln = ln.strip()
        if ln.startswith("{") and "queries/sec" in ln:
            line = ln
    if line is None:
        tail = (out.stderr or out.stdout).strip().splitlines()[-3:]
        return {"label": label, "flags": flags, "error": " | ".join(tail)}
    rec = json.loads(line)
    return {"label": label, "flags": flags, "qps": rec["value"],
            "vs_baseline": rec.get("vs_baseline")}


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--chunk", type=int, default=256)
    ap.add_argument("--quick", action="store_true", help="first 6 candidates only")
    ap.add_argument("--only", type=str, default=None,
                    help="comma-separated labels to run")
    args = ap.parse_args()

    cands = CANDIDATES[:6] if args.quick else CANDIDATES
    if args.only:
        want = set(args.only.split(","))
        cands = [c for c in CANDIDATES if c[0] in want]
    results = []
    for label, flags in cands:
        rec = run_one(label, flags, args.batch, args.chunk)
        print(json.dumps(rec), flush=True)
        results.append(rec)

    ok = [r for r in results if "qps" in r]
    ok.sort(key=lambda r: -r["qps"])
    outpath = os.path.join(REPO, "docs", "FLAG_SWEEP.json")
    with open(outpath, "w") as f:
        json.dump({"batch": args.batch, "results": results,
                   "ranked": [(r["label"], r["qps"]) for r in ok]}, f, indent=1)
    print("wrote", outpath)


if __name__ == "__main__":
    main()
