"""Benchmark: SeqPAN batch-eval throughput in queries/sec/chip.

This is BASELINE.json's north-star metric ("queries/sec/chip batch eval").
We time the full eval step — bf16 forward + masked-softmax span inference —
on Charades SeqPAN dims (vlen 64, dim 128, vdim 1024, batch 128).

Timing protocol (important on tunneled devices, where block_until_ready acks
BEFORE execution finishes — verified with a 1.1 TFLOP matmul "completing" in
0.05 ms): the eval loop runs ON DEVICE inside one jit (a lax.fori_loop over
per-iteration-varied batches, the realistic offline batch-eval shape), the
scalar result's BYTES are fetched as the completion barrier, and two loop
lengths are differenced so the fetch round-trip cancels out.

``vs_baseline`` divides by a MEASURED bound on the reference's single-GPU
throughput: docs/REF_BASELINE.json, produced by
``python -m vmrframe_tpu.tools.measure_reference``, which times the actual
reference code on this host (full-dims CPU eval + the eager-dispatch floor
that bounds its per-batch time on any accelerator — it uses no CUDA graphs)
and derives ``ref_gpu_qps_bound`` as a deliberately GENEROUS upper bound on
a V100-class GPU.  vs_baseline is therefore a LOWER bound on the true
speedup.  If the JSON is absent, falls back to the round-1 2000 q/s
estimate (flagged in the output as provenance "estimate").

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

REFERENCE_GPU_QPS_ESTIMATE = 2000.0  # round-1 fallback only


def reference_baseline_qps():
    """(qps, provenance) — measured bound if available, else the estimate."""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "docs", "REF_BASELINE.json")
    try:
        with open(path) as f:
            data = json.load(f)
        return float(data["ref_gpu_qps_bound"]), "measured_bound"
    except Exception:
        return REFERENCE_GPU_QPS_ESTIMATE, "estimate"


def main(batch_size=128, chunk=256, serialized=False):
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _build, _make_cfg
    from vmrframe_tpu.ops.chunked import chunked_batch_apply

    cfg = _make_cfg(batch_size=batch_size)
    model, entry, derived, batch, _ = _build(cfg, batch_size=batch_size)
    rng = jax.random.PRNGKey(0)
    variables = model.init({"params": rng, "dropout": rng, "gumbel": rng}, batch, True)

    from vmrframe_tpu.ops.precision import cast_floating

    def to_bf16(tree):
        # vector-param policy: rank<=1 params stay f32 (ops/precision.py)
        return cast_floating(tree, jnp.bfloat16)

    device = jax.devices()[0]
    vb = to_bf16(jax.device_put(variables, device))
    bb = to_bf16(jax.device_put(batch, device))

    def make_loop(n, serialized=False):
        @jax.jit
        def loop(variables, batch):
            def fwd_infer(b):
                out = model.apply(variables, b, True)
                o32 = jax.tree_util.tree_map(
                    lambda x: x.astype(jnp.float32)
                    if hasattr(x, "dtype") and x.dtype == jnp.bfloat16 else x, out)
                return entry.infer_fn(o32, b, cfg)

            def body(i, acc):
                b = dict(batch)
                # different data every iteration (the perturbations depend
                # on i, so nothing is loop-invariant and the compiler can't
                # hoist the model).  The video perturbation is an
                # i-dependent scalar OFFSET: it fuses into the first
                # consumer, so no copy of vfeats is materialized — a real
                # batch-eval driver hands the model fresh HBM-resident data,
                # it does not copy it first (the old jnp.roll paid an extra
                # read+write of the whole buffer inside every measured
                # step).  The tiny id tensors roll along the batch axis so
                # the text branch can't be hoisted either.  Offline eval
                # batches are INDEPENDENT, so the default protocol does NOT
                # feed the accumulator back into the inputs — XLA may
                # software-pipeline consecutive iterations exactly as a real
                # batch-eval driver overlaps them.  --serialized restores
                # the strict chain (each batch's bytes depend on the
                # previous result) for latency-style measurement.
                v = batch["vfeats"]
                # NB: perturbations must be cast to vfeats' dtype — acc is
                # f32 and bf16 + f32 would promote the whole forward to f32.
                delta = (i.astype(jnp.float32) * 1e-6 + (
                    acc * 1e-9 if serialized else 0.0)).astype(v.dtype)
                b["vfeats"] = v + delta
                for key in ("words_ids", "chars_ids"):
                    if key in batch:
                        b[key] = jnp.roll(batch[key], i, axis=0)
                # beyond the measured fusion knee (B>256) run the compact
                # per-chunk schedule (ops/chunked.py has the measurements)
                props = (chunked_batch_apply(fwd_infer, b, batch_size, chunk)
                         if chunk else fwd_infer(b))
                return acc + jnp.sum(props)
            return jax.lax.fori_loop(0, n, body, 0.0)
        return loop

    def timed(n, reps=3):
        fn = make_loop(n, serialized=serialized)
        np.asarray(fn(vb, bb))  # warm/compile; byte fetch = real barrier
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(fn(vb, bb))
            best = min(best, time.perf_counter() - t0)
        return best

    n_small, n_big = (50, 450) if batch_size <= 256 else (20, 120)
    per_step = (timed(n_big) - timed(n_small)) / (n_big - n_small)
    qps = batch_size / per_step
    baseline_qps, provenance = reference_baseline_qps()
    # session-drift context: eval-step timings drift +/-35% between sessions
    # on the tunneled chip (BASELINE.md "Timing drift"); the capability
    # minimum is the best cross-session measurement at this config, so a
    # single BENCH_r0N.json is self-explaining when the tunnel is slow.
    CAPABILITY_MIN_QPS = 158508.0  # BENCH_ZOO round-5 session minimum, B=128
    print(json.dumps({
        "metric": "seqpan_eval_queries_per_sec_per_chip",
        "value": round(qps, 1),
        "unit": "queries/sec/chip",
        "vs_baseline": round(qps / baseline_qps, 2),
        "baseline_qps": baseline_qps,
        "baseline_provenance": provenance,
        "capability_min_qps": CAPABILITY_MIN_QPS,
        "session_vs_capability_pct": round(100.0 * qps / CAPABILITY_MIN_QPS, 1),
        "drift_note": "sessions drift +/-35% on the tunneled chip; see BASELINE.md 'Timing drift'",
        **({"batch_size": batch_size} if batch_size != 128 else {}),
        **({"protocol": "serialized"} if serialized else {}),
    }))


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    # optional offline/serving batch size (default 128 = the reference's
    # shipped Charades batch, the comparable headline number)
    ap.add_argument("--batch", type=int, default=128)
    # chunked large-batch tiling (ops/chunked.py); 0 disables
    ap.add_argument("--chunk", type=int, default=256)
    # strict per-batch dependency chain (latency-style); default measures
    # independent batches, the real offline/serving shape
    ap.add_argument("--serialized", action="store_true")
    _a = ap.parse_args()
    bs, ck = _a.batch, _a.chunk
    # the tunneled TPU backend occasionally fails registration transiently
    # (see .claude/skills/verify); one retry in a fresh attempt covers it
    try:
        main(bs, ck, _a.serialized)
    except RuntimeError as e:
        if "backend" in str(e).lower():
            import time as _t

            _t.sleep(20)
            main(bs, ck, _a.serialized)
        else:
            raise
