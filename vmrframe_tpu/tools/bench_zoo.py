"""Honest on-chip step timings for the whole model zoo at shipped dims.

Round 1's BASELINE.md rows for BAN/CCA/ActionFormer/CPL were host-dispatch
upper bounds measured before the fetch-barrier fix.  This tool times the
FULL train step (fwd + loss + grad + AdamW + inference + IoU) and the eval
step for each family with the trustworthy on-device protocol bench.py uses:

- the step runs inside one jitted ``lax.fori_loop`` whose carry chains each
  iteration to the previous one (train: the TrainState itself; eval: a
  scalar token folded into the input features), so iterations can neither
  be hoisted nor reordered;
- the loop result's BYTES are fetched as the completion barrier (on the
  tunneled device ``block_until_ready`` acks before execution finishes);
- two loop lengths are differenced so the fetch round-trip cancels.

Configs are the REFERENCE's own shipped YAML/JSON files (synthetic data,
CCA's concept paths overridden to synthetic).  Writes docs/BENCH_ZOO.json
and prints one JSON line per model.

Usage: python -m vmrframe_tpu.tools.bench_zoo [--models SeqPAN,BAN,...]
       [--n-small 5 --n-big 20] [--cpu]
"""

from __future__ import annotations

import argparse
import json
import os
import time
import traceback

import numpy as np

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
REF = "/root/reference/config"

MODELS = {
    "SeqPAN": (f"{REF}/charades/SeqPAN.yaml", {}),
    # the reference's BAN.json carries no text-length key (its collate pads
    # per-batch, BANlib pad_collate); our static-shape batcher needs one
    "BAN": (f"{REF}/charades/BAN.json", {"model.tlen": 25}),
    "CCA": (f"{REF}/anet/CCA.yaml", {"paths.concept_name": "", "paths.com_concept": "",
                                     "model.tlen": 25}),
    "ActionFormer": (f"{REF}/charades/ActionFormer.yaml", {}),
    "CPL": (f"{REF}/charades/main_i3d_cpl.json", {"model.tlen": 25}),
    # round-4 train-side A/B variants (docs/TRACE_CPL_TRAIN.json motivated).
    # Outcomes: remat (drop the 67 MB prob-map residuals) measured NEGATIVE
    # on chip (28.2 -> 37.2 ms over the repeated path); shared-prefix in
    # train mode measured 1.24x (28.15 -> 22.62) and became the default —
    # CPL_rep keeps the old repeated path measurable, CPL_sp was its alias
    # during the A/B (same as default CPL now).
    "CPL_remat": (f"{REF}/charades/main_i3d_cpl.json",
                  {"model.tlen": 25, "others.cpl_remat": True}),
    "CPL_rep": (f"{REF}/charades/main_i3d_cpl.json",
                {"model.tlen": 25, "others.cpl_shared_prefix": "eval"}),
    "CPL_sp": (f"{REF}/charades/main_i3d_cpl.json",
               {"model.tlen": 25, "others.cpl_shared_prefix": "always"}),
    # round-4 CCA train-regression bisect: commit 89fe514's contraction
    # scores landed after the r3 63.9 ms zoo row with only a CPU A/B; the
    # round-4 on-chip re-measure found train 99.6 ms (eval improved).  The
    # default is now "eval" (contraction in deterministic mode only); this
    # twin forces the contraction into the train step to keep the
    # regression measurable.
    "CCA_contract": (f"{REF}/anet/CCA.yaml",
                     {"paths.concept_name": "", "paths.com_concept": "",
                      "model.tlen": 25,
                      "others.cca_contraction_scores": "always"}),
    # round-5 CCA train attack (docs/ROOFLINE_TRACE_TRAIN.json: the r4-default
    # step ran at 35% of its realizable floor — ~26 ms of map scatters +
    # product-form scores).  New defaults: one-gather map assembly
    # (ops/windowed.py::cell_segment_max_map) + custom-VJP cosine scores
    # (models/cca.py::cosine_sum_scores).  Twins isolate each knob:
    "CCA_scattermap": (f"{REF}/anet/CCA.yaml",
                       {"paths.concept_name": "", "paths.com_concept": "",
                        "model.tlen": 25, "others.cca_map_impl": "scatter"}),
    "CCA_legacyscores": (f"{REF}/anet/CCA.yaml",
                         {"paths.concept_name": "", "paths.com_concept": "",
                          "model.tlen": 25,
                          "others.cca_contraction_scores": "eval"}),
    "CCA_r4default": (f"{REF}/anet/CCA.yaml",
                      {"paths.concept_name": "", "paths.com_concept": "",
                       "model.tlen": 25, "others.cca_map_impl": "scatter",
                       "others.cca_contraction_scores": "eval"}),
    # ...and the forced-flat twin for the flat-vs-tree A/B at CCA dims
    # (tree is CCA's registry default after the same-session 57.1-vs-62.7 A/B)
    "CCA_flatopt": (f"{REF}/anet/CCA.yaml",
                    {"paths.concept_name": "", "paths.com_concept": "",
                     "model.tlen": 25, "train.flat_optimizer": True}),
    # round-4 AF train-regression bisect: the only r2->r3 change on the AF
    # train path is flat_adamw becoming the default (0196840); this twin
    # runs the optax tree chain for the on-chip A/B
    "ActionFormer_treeopt": (f"{REF}/charades/ActionFormer.yaml",
                             {"train.flat_optimizer": False}),
    # ...and the masks-at-init flat_adamw forced on, to locate the auto
    # crossover (how much of the 2.9 ms was the per-step mask rebuild vs
    # the intrinsic ravel/unravel traffic)
    "ActionFormer_flatfix": (f"{REF}/charades/ActionFormer.yaml",
                             {"train.flat_optimizer": True}),
    # long-video regime: T=2304, window 19 — the banded Pallas kernel
    # auto-enables with the round-5 MODE SPLIT (train: Pallas; eval: XLA —
    # each mode's measured winner, docs/BENCH_AF_LONG.json).  Twins force
    # the other side: ...XLA = band-mask path in both modes, ...PallasEval
    # = the pre-round-5 both-modes-Pallas behavior.
    "ActionFormerLong": (f"{REPO}/configs/tacos_actionformer_long.yaml", {}),
    "ActionFormerLongXLA": (f"{REPO}/configs/tacos_actionformer_long.yaml",
                            {"actionformer.pallas_min_len": -1}),
    "ActionFormerLongPallasEval": (f"{REPO}/configs/tacos_actionformer_long.yaml",
                                   {"actionformer.pallas_min_len_eval": 512}),
    # long-video 2D-map regime: 128-grid, 2D-TAN TACoS pooling recipe
    "BANLong": (f"{REPO}/configs/tacos_ban_long.yaml", {}),
    # throughput variant: the compact map leaves HBM headroom for 4x batch
    "BANLong_B32": (f"{REPO}/configs/tacos_ban_long.yaml", {"train.batch_size": 32}),
    # round-5 depthwise-conv formulation A/B (layers/basic.py::DepthwiseConv1D):
    # shift = k shifted multiply-adds instead of the grouped-conv lowering
    # whose train-grad fusions measured ~61 us each at 103 GB/s
    # (docs/TRACE_SEQPAN_TRAIN.json)
    "SeqPAN_shiftconv": (f"{REF}/charades/SeqPAN.yaml",
                         {"train.depthwise_impl": "shift"}),
    # ...and the conv-forced twin (the pre-round-5 both-modes behavior;
    # the shipped default is the mode split "shift_train")
    "SeqPAN_convdw": (f"{REF}/charades/SeqPAN.yaml",
                      {"train.depthwise_impl": "conv"}),
    # round-4 dropout-bits A/B: 32 forces the flax-exact u32 masks (the
    # pre-round-4 behavior) against the u8 default (layers/dropout.py)
    "SeqPAN_u32drop": (f"{REF}/charades/SeqPAN.yaml", {"train.dropout_bits": 32}),
    "CPL_u32drop": (f"{REF}/charades/main_i3d_cpl.json",
                    {"model.tlen": 25, "train.dropout_bits": 32}),
    "CCA_u32drop": (f"{REF}/anet/CCA.yaml",
                    {"paths.concept_name": "", "paths.com_concept": "",
                     "model.tlen": 25, "train.dropout_bits": 32}),
    # mixed-precision training variants (train.compute_dtype)
    "SeqPAN_bf16": (f"{REF}/charades/SeqPAN.yaml",
                    {"train.compute_dtype": "bfloat16"}),
    # ...with the depthwise conv lowering forced (is the shift-conv train
    # win dtype-dependent?)
    "SeqPAN_bf16_convdw": (f"{REF}/charades/SeqPAN.yaml",
                           {"train.compute_dtype": "bfloat16",
                            "train.depthwise_impl": "conv"}),
    "BAN_bf16": (f"{REF}/charades/BAN.json",
                 {"model.tlen": 25, "train.compute_dtype": "bfloat16"}),
    "CCA_bf16": (f"{REF}/anet/CCA.yaml",
                 {"paths.concept_name": "", "paths.com_concept": "",
                  "model.tlen": 25, "train.compute_dtype": "bfloat16"}),
    "ActionFormer_bf16": (f"{REF}/charades/ActionFormer.yaml",
                          {"train.compute_dtype": "bfloat16"}),
    "CPL_bf16": (f"{REF}/charades/main_i3d_cpl.json",
                 {"model.tlen": 25, "train.compute_dtype": "bfloat16"}),
}


def _apply_overrides(cfg, overrides):
    return cfg.updated(overrides) if overrides else cfg


def _first_float_key(batch):
    for k, v in batch.items():
        if hasattr(v, "dtype") and np.issubdtype(np.asarray(v).dtype, np.floating) \
                and np.asarray(v).ndim >= 2:
            return k
    raise ValueError("no float tensor in batch to perturb")


def bench_model(name: str, n_small: int, n_big: int):
    import jax
    import jax.numpy as jnp

    from vmrframe_tpu.config import Derived, load_config
    from vmrframe_tpu.data.batcher import Batcher
    from vmrframe_tpu.registry import get_model_entry
    from vmrframe_tpu.testing import make_synthetic_data
    from vmrframe_tpu.train.trainer import Trainer

    path, overrides = MODELS[name]
    cfg = _apply_overrides(load_config(path), overrides)
    B = int(cfg.train.batch_size)
    dataset, store = make_synthetic_data(cfg, seed=0, n_train=2 * B, n_test=B)
    derived = Derived(num_words=dataset["n_words"], num_chars=dataset["n_chars"],
                      num_train_steps=1000, steps_per_epoch=10)
    entry = get_model_entry(cfg.model.name)
    batcher_cls = entry.batcher_cls or Batcher
    batcher = batcher_cls(dataset["train_set"], store, cfg, derived, "train")
    batch = next(batcher.epoch(seed=0))
    trainer = Trainer(cfg, derived, dataset["word_vector"])
    rng = jax.random.PRNGKey(0)
    state = trainer.init_state(rng, batch)
    # per-step streams use the same impl production fit() uses (rbg default)
    step_rng = jax.random.key(0, impl=str(cfg.train.get("prng_impl", "rbg")))
    n_params = sum(int(np.prod(np.asarray(x).shape))
                   for x in jax.tree_util.tree_leaves(state.params))
    device_batch = trainer._shard_batch(batch)
    pkey = _first_float_key(device_batch)

    # runtime loop bound: fori_loop lowers to while_loop, so ONE compile
    # serves both loop lengths (compile time dominates on the tunnel)
    @jax.jit
    def train_loop(state, batch, rng, n):
        def body(i, carry):
            st, tok = carry
            b = dict(batch)
            b[pkey] = batch[pkey] + (tok * 1e-9 + i * 0.0).astype(batch[pkey].dtype)
            st2, metrics = trainer._train_step(st, b, rng)
            return (st2, metrics["loss"].astype(jnp.float32))
        _, tok = jax.lax.fori_loop(0, n, body, (state, jnp.float32(0.0)))
        return tok

    @jax.jit
    def eval_loop(state, batch, n):
        def body(i, tok):
            b = dict(batch)
            b[pkey] = batch[pkey] + (tok * 1e-9).astype(batch[pkey].dtype)
            metrics = trainer._eval_step(state, b)
            return jnp.sum(metrics["ious"]).astype(jnp.float32)
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    def timed(fn, args, n, reps=2):
        np.asarray(fn(*args, jnp.int32(n)))  # compile + warm; byte fetch = barrier
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(fn(*args, jnp.int32(n)))
            best = min(best, time.perf_counter() - t0)
        return best

    res = {"model": name, "batch_size": B, "params": n_params,
           "config": os.path.relpath(path, "/root/reference")}
    tr = (timed(train_loop, (state, device_batch, step_rng), n_big)
          - timed(train_loop, (state, device_batch, step_rng), n_small)) / (n_big - n_small)
    res["train_ms_per_step"] = round(tr * 1e3, 2)
    res["train_samples_per_sec"] = round(B / tr, 1)
    # eval steps are 10-40x cheaper than train steps: use proportionally
    # longer loops so tunnel RTT noise (~ms) stops dominating the delta
    ev_small, ev_big = n_small * 5, n_big * 5
    ev = (timed(eval_loop, (state, device_batch), ev_big)
          - timed(eval_loop, (state, device_batch), ev_small)) / (ev_big - ev_small)
    res["eval_ms_per_step"] = round(ev * 1e3, 2)
    res["eval_qps"] = round(B / ev, 1)

    # --- MFU accounting: XLA's own per-step cost analysis vs silicon peak.
    # v5e peak is 394 TFLOP/s in bf16; f32 ops are emulated on the same MXU
    # (about half rate via bf16x3 passes), so MFU for f32 configs is quoted
    # against the same bf16 peak — a deliberately conservative denominator.
    PEAK_FLOPS = 394e12
    try:
        @jax.jit
        def one_train(state, batch, rng):
            st, metrics = trainer._train_step(state, batch, rng)
            return metrics["loss"]

        @jax.jit
        def one_eval(state, batch):
            return trainer._eval_step(state, batch)["ious"]

        ca_t = one_train.lower(state, device_batch, step_rng).compile().cost_analysis()
        ca_e = one_eval.lower(state, device_batch).compile().cost_analysis()
        tf = float(ca_t.get("flops", 0.0))
        ef = float(ca_e.get("flops", 0.0))
        res["train_gflops_per_step"] = round(tf / 1e9, 2)
        res["eval_gflops_per_step"] = round(ef / 1e9, 2)
        res["train_achieved_tflops"] = round(tf / tr / 1e12, 2)
        res["eval_achieved_tflops"] = round(ef / ev / 1e12, 2)
        res["train_mfu_pct"] = round(100.0 * tf / tr / PEAK_FLOPS, 2)
        res["eval_mfu_pct"] = round(100.0 * ef / ev / PEAK_FLOPS, 2)
        # --- bandwidth accounting + bound classification.  "bytes accessed"
        # is XLA's whole-program buffer traffic (HBM-resident operands; VMEM
        # re-use not subtracted) — an upper bound on HBM bytes, same basis
        # as tools/roofline.py.  v5e HBM peak ~819 GB/s.
        PEAK_HBM = 819e9
        tb = float(ca_t.get("bytes accessed", 0.0))
        eb = float(ca_e.get("bytes accessed", 0.0))
        res["train_hbm_gb_per_step"] = round(tb / 1e9, 3)
        res["eval_hbm_gb_per_step"] = round(eb / 1e9, 3)
        res["train_hbm_gbps"] = round(tb / tr / 1e9, 1)
        res["eval_hbm_gbps"] = round(eb / ev / 1e9, 1)

        def classify(flops, byts, sec):
            """Which silicon limit is the step nearest?  >=25% of MXU peak ->
            compute-bound enough that only math changes help; >=50% of HBM
            peak -> bandwidth-bound (fusion/precision changes help); else the
            step is schedule-bound: XLA fusion granularity / layout copies /
            small-op dispatch, the regime docs/ROOFLINE_TRACE.json measures."""
            mxu = flops / sec / PEAK_FLOPS
            hbm = byts / sec / PEAK_HBM
            if mxu >= 0.25:
                return f"MXU ({100*mxu:.0f}% of bf16 peak)"
            if hbm >= 0.50:
                # >100% is possible: "bytes accessed" counts VMEM-reused
                # buffers, so it upper-bounds true HBM traffic
                return f"HBM ({100*hbm:.0f}% of 819 GB/s upper-bound bytes)"
            return (f"schedule/permute (MXU {100*mxu:.1f}%, HBM {100*hbm:.0f}%"
                    " — fusion granularity, not silicon)")

        res["train_bound"] = classify(tf, tb, tr)
        res["eval_bound"] = classify(ef, eb, ev)
    except Exception as e:  # cost analysis availability is backend-dependent
        res["mfu_error"] = f"{type(e).__name__}: {e}"
    return res


def _annotate_vs_ref(res):
    """vs_ref columns: this row's measured qps over the per-family reference
    bound (docs/REF_BASELINE.json ``families``, produced by
    tools/measure_reference.py — a GENEROUS upper bound on the unmodified
    reference on a V100-class GPU, so these multiples are lower bounds).
    Variant rows (SeqPAN_u32drop, CPL_remat, ...) match their base family;
    the long-video configs have no reference equivalent and stay bare."""
    ref_path = os.path.join(REPO, "docs", "REF_BASELINE.json")
    try:
        with open(ref_path) as f:
            fams = json.load(f).get("families", {})
    except (OSError, json.JSONDecodeError):
        return res
    base = res.get("model", "")
    for fam in sorted(fams, key=len, reverse=True):
        if base == fam or base.startswith(fam + "_"):
            fam_row = fams[fam]
            if "Long" in base:
                return res  # different workload dims — not comparable
            ev_bound = fam_row.get("eval", {}).get("ref_gpu_qps_bound")
            tr_bound = fam_row.get("train", {}).get("ref_gpu_qps_bound")
            if ev_bound and res.get("eval_qps"):
                res["vs_ref_eval"] = round(res["eval_qps"] / ev_bound, 2)
            if tr_bound and res.get("train_samples_per_sec"):
                res["vs_ref_train"] = round(res["train_samples_per_sec"] / tr_bound, 2)
            return res
    return res


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", default=",".join(MODELS))
    ap.add_argument("--n-small", type=int, default=5)
    ap.add_argument("--n-big", type=int, default=20)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default=os.path.join(REPO, "docs", "BENCH_ZOO.json"))
    ap.add_argument("--round", type=int, default=None,
                    help="stamp measured_round on every row this run writes "
                         "(VERDICT r3 stale-row discipline)")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    # merge into the existing file so a partial --models run (or a run
    # killed mid-way) never drops other models' rows
    results = []
    if os.path.exists(args.out):
        try:
            with open(args.out) as f:
                results = json.load(f).get("results", [])
        except (json.JSONDecodeError, OSError):
            results = []
    # refresh vs_ref on carried-over rows too (idempotent; picks up a newer
    # REF_BASELINE.json without re-measuring the chip side)
    results = [_annotate_vs_ref(r) for r in results]

    def upsert(res):
        for i, row in enumerate(results):
            if row.get("model") == res["model"]:
                results[i] = res
                return
        results.append(res)

    for name in args.models.split(","):
        name = name.strip()
        try:
            res = bench_model(name, args.n_small, args.n_big)
        except Exception as e:
            res = {"model": name, "error": f"{type(e).__name__}: {e}",
                   "trace": traceback.format_exc()[-1500:]}
        if args.round is not None:
            res["measured_round"] = args.round
        res = _annotate_vs_ref(res)
        print(json.dumps({k: v for k, v in res.items() if k != "trace"}), flush=True)
        upsert(res)
        import jax

        payload = {"device": str(jax.devices()[0]),
                   "protocol": "fori_loop + byte-fetch barrier, diff of two loop lengths",
                   "results": results}
        with open(args.out, "w") as f:  # incremental: survive timeouts
            json.dump(payload, f, indent=2)


if __name__ == "__main__":
    main()
