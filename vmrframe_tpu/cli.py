"""CLI — drop-in equivalent of the reference's ``python main.py``.

Usage (same flags as reference main.py:34-42):

    python -m vmrframe_tpu --config config/charades/SeqPAN.yaml
    python -m vmrframe_tpu --config ... --eval --checkpoint ckpt/...
    python -m vmrframe_tpu --config ... --debug          # lazy feature load
    python -m vmrframe_tpu --config ... --synthetic      # no data on disk

``--synthetic`` is new: runs the full train/eval path on deterministic random
features + annotations so the engine is exercisable on any machine.
"""

from __future__ import annotations

import argparse
import logging
import os
import time


def parse_args(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, required=True, help="config file path")
    parser.add_argument("--checkpoint", type=str, default=None, help="checkpoint path to resume")
    parser.add_argument("--eval", action="store_true", help="only evaluate")
    parser.add_argument("--debug", action="store_true", help="lazy feature loading")
    parser.add_argument("--suffix", type=str, default="", help="task suffix")
    parser.add_argument("--seed", default=1234, type=int, help="random seed")
    parser.add_argument("--synthetic", action="store_true", help="synthetic features/annotations")
    parser.add_argument("--epochs", type=int, default=None, help="override train.epochs")
    parser.add_argument("--save-results", type=str, default=None,
                        help="with --eval: write per-sample predictions JSON here")
    parser.add_argument("--bf16", action="store_true",
                        help="mixed-precision training (train.compute_dtype: "
                             "bfloat16 — params f32, compute bf16)")
    return parser.parse_args(argv)


def setup_logger(ckpt_dir: str, title: str) -> logging.Logger:
    os.makedirs(ckpt_dir, exist_ok=True)
    log_file = os.path.join(ckpt_dir, time.strftime("%Y%m%d_%H%M%S") + f"_{title}.log")
    logger = logging.getLogger("vmrframe_tpu")
    logger.setLevel(logging.DEBUG)
    logger.propagate = False  # absl/jax install a root handler; avoid double lines
    logger.handlers.clear()
    ch = logging.StreamHandler()
    ch.setFormatter(logging.Formatter("%(levelname)s:%(message)s"))
    fh = logging.FileHandler(log_file)
    fh.setFormatter(logging.Formatter("%(levelname)s:%(message)s"))
    fh.setLevel(logging.INFO)
    logger.addHandler(ch)
    logger.addHandler(fh)
    return logger


def main(argv=None):
    args = parse_args(argv)

    # honor JAX_PLATFORMS even on hosts whose sitecustomize pins another
    # backend (e.g. the axon TPU tunnel overrides the env var after import)
    if os.environ.get("JAX_PLATFORMS"):
        import jax

        try:
            jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
        except Exception:
            pass

    from vmrframe_tpu.config import Derived, load_config
    from vmrframe_tpu.data.batcher import Batcher
    from vmrframe_tpu.data.datasets import load_dataset
    from vmrframe_tpu.data.features import open_feature_store
    from vmrframe_tpu.metrics import get_i345_mi
    from vmrframe_tpu.registry import get_model_entry
    from vmrframe_tpu.train.trainer import Trainer, fit

    cfg = load_config(args.config)
    if args.epochs is not None:
        cfg = cfg.updated({"train.epochs": args.epochs})
    if args.bf16:
        cfg = cfg.updated({"train.compute_dtype": "bfloat16"})
    derived = Derived(suffix=args.suffix, seed=args.seed, debug=args.debug)

    if args.synthetic:
        from vmrframe_tpu.testing import make_synthetic_data

        dataset, features = make_synthetic_data(cfg, seed=args.seed)
    else:
        features = open_feature_store(cfg.paths.feature_path, cfg.model.vlen, lazy=args.debug)
        dataset = load_dataset(cfg, derived, vfeat_lens=features.lengths())

    derived.num_words = dataset["n_words"]
    derived.num_chars = dataset["n_chars"]

    entry = get_model_entry(cfg.model.name)
    batcher_cls = entry.batcher_cls or Batcher
    train_batcher = batcher_cls(dataset["train_set"], features, cfg, derived, "train")
    test_batcher = batcher_cls(dataset["test_set"], features, cfg, derived, "test")
    derived.steps_per_epoch = len(train_batcher)
    derived.num_train_steps = len(train_batcher) * cfg.train.epochs

    ckpt_dir = os.path.join(cfg.paths.ckpt_dir, f"{cfg.task}_{derived.suffix}")
    logger = setup_logger(ckpt_dir, cfg.model.name)
    logger.info(str(args))

    trainer = Trainer(cfg, derived, dataset["word_vector"])

    if args.eval:
        import jax

        state = trainer.init_state(jax.random.PRNGKey(args.seed), next(test_batcher.epoch(seed=0)))
        if args.checkpoint:
            from vmrframe_tpu.train.checkpoints import restore_into_state

            state = restore_into_state(args.checkpoint, state)
        ious, lossmeter, secs, props = trainer.run_eval_epoch(
            state, test_batcher.epoch(seed=0), collect_props=True)
        r1i3, r1i5, _, r1i7, mi = get_i345_mi(ious)
        logger.info(
            f"TEST |\tR1I3: {r1i3:.2f}\tR1I5: {r1i5:.2f}\tR1I7: {r1i7:.2f}\t"
            f"mIoU: {mi:.2f}\tloss:{lossmeter.avg:.4f}\tcompute_s:{secs:.2f}"
        )
        if args.save_results:
            # the prediction export the reference never had (its --eval only
            # logs metrics, main.py:138-153): [vid, pred_seconds, gt_seconds, iou]
            import json

            records = dataset["test_set"]
            out = []
            for rec, p, iou in zip(records, props, ious):
                dur = rec["duration"]
                out.append({
                    "vid": rec["vid"],
                    "sentence": rec["sentence"],
                    "pred_time": [float(p[0]) * dur, float(p[1]) * dur],
                    "gt_time": [float(rec["se_time"][0]), float(rec["se_time"][1])],
                    "iou": float(iou),
                })
            with open(args.save_results, "w", encoding="utf8") as f:
                json.dump(out, f)
            logger.info(f"wrote {len(out)} predictions to {args.save_results}")
        return {"r1i3": r1i3, "r1i5": r1i5, "r1i7": r1i7, "miou": mi}

    result = fit(trainer, train_batcher, test_batcher, rng_seed=args.seed,
                 ckpt_dir=ckpt_dir, log=logger.info, resume_from=args.checkpoint)
    logger.info(f"best mIoU: {result['best_miou']:.2f}")
    if args.save_results:
        # training-mode export: the per-epoch test-metric history + best
        import json

        with open(args.save_results, "w", encoding="utf8") as f:
            json.dump({"best_miou": result["best_miou"],
                       "best_path": result["best_path"],
                       "history": result["history"]}, f)
        logger.info(f"wrote training history to {args.save_results}")
    return result


if __name__ == "__main__":
    main()
