"""End-to-end train throughput: host vs on-device input pipeline.

The augmented configs (TACoS ships erosion 0.05, reference
config/tacos/SeqPAN.yaml:23) historically paid ~110 ms/batch of host
assembly vs ~4 ms for the identity path (BASELINE.md).  Round 2 moved
augmentation/resampling/label-gen into the jitted step
(ops/input_pipeline.py) and made that the default for erosion/dilation
configs (data/batcher.py).  This tool measures what that buys END TO END:
a full training epoch — host batcher + prefetch thread + jitted train
step — with ``dataprocess.device_pipeline`` forced off vs on.

Per variant: one warmup epoch (pays compile), then best-of-N timed epochs;
the epoch's final loss is fetched by VALUE (byte fetch) as the completion
barrier (block_until_ready acks early on tunneled devices).

Writes docs/BENCH_PIPELINE.json.

Usage: python -m vmrframe_tpu.tools.bench_pipeline [--cpu] [--n-batches 24]
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
REF = "/root/reference/config"

CASES = {
    # TACoS ships erosion (the config the device pipeline is FOR)
    "tacos_seqpan_erosion": (f"{REF}/tacos/SeqPAN.yaml", {}),
    # Charades dims with erosion switched on (the B=128 regime)
    "charades_seqpan_erosion": (
        f"{REF}/charades/SeqPAN.yaml",
        {"dataprocess.video_augmentation": {"erosion": 0.05}},
    ),
}


def bench_case(name: str, overrides: dict, n_batches: int, reps: int = 2):
    import jax

    from vmrframe_tpu.config import Derived, load_config
    from vmrframe_tpu.data.batcher import Batcher, BatchPrefetcher
    from vmrframe_tpu.testing import make_synthetic_data
    from vmrframe_tpu.train.trainer import Trainer

    path, base_overrides = CASES[name]
    out = {"case": name, "config": os.path.relpath(path, "/root/reference")}
    for variant, flag in (("host", False), ("device", True)):
        cfg = load_config(path).updated({
            **base_overrides, **overrides,
            "dataprocess.device_pipeline": flag,
        })
        B = int(cfg.train.batch_size)
        n_train = B * n_batches
        dataset, store = make_synthetic_data(cfg, seed=0, n_train=n_train, n_test=B)
        derived = Derived(num_words=dataset["n_words"], num_chars=dataset["n_chars"],
                          num_train_steps=n_batches * (reps + 1), steps_per_epoch=n_batches)
        batcher = Batcher(dataset["train_set"], store, cfg, derived, "train")
        trainer = Trainer(cfg, derived, dataset["word_vector"])
        rng = jax.random.PRNGKey(0)
        state = trainer.init_state(rng, next(batcher.epoch(seed=0)))
        step = trainer.compiled_train_step()

        def epoch(state, seed):
            m = None
            for batch in BatchPrefetcher(batcher.epoch(seed=seed)):
                state, m = step(state, trainer._shard_batch(batch), rng)
            np.asarray(m["loss"])  # byte fetch = real completion barrier
            return state

        state = epoch(state, seed=0)  # warmup epoch: compile + caches
        best = float("inf")
        for r in range(reps):
            t0 = time.perf_counter()
            state = epoch(state, seed=1 + r)
            best = min(best, time.perf_counter() - t0)
        out[variant] = {
            "pipeline_on_device": flag and batcher.device_pipeline,
            "batch_size": B,
            "n_batches": n_batches,
            "epoch_s": round(best, 3),
            "samples_per_sec": round(n_train / best, 1),
        }
    out["speedup"] = round(out["device"]["samples_per_sec"]
                           / out["host"]["samples_per_sec"], 2)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--n-batches", type=int, default=24)
    ap.add_argument("--cases", default=",".join(CASES))
    ap.add_argument("--out", default=os.path.join(REPO, "docs", "BENCH_PIPELINE.json"))
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    results = []
    for name in args.cases.split(","):
        res = bench_case(name.strip(), {}, args.n_batches)
        print(json.dumps(res), flush=True)
        results.append(res)
        import jax

        with open(args.out, "w") as f:
            json.dump({"device": str(jax.devices()[0]), "results": results}, f, indent=2)


if __name__ == "__main__":
    main()
