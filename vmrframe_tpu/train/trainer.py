"""The TPU trainer/eval engine.

Replaces the reference's inline epoch loop (main.py:75-153) with a fused,
sharded design:

- ONE jitted train step = forward + loss + grad + clip + AdamW update +
  span inference + per-sample IoU — no host round-trips inside the step;
  params/opt_state buffers are donated.
- Data parallelism over a ``jax.sharding.Mesh`` axis ``'data'``: batches are
  sharded, params replicated; XLA inserts the grad all-reduce over ICI.
  This is the idiomatic replacement for nn.DataParallel (main.py:22-24).
- Eval = deterministic forward + loss + inference + IoU, also one jitted fn.
- Per-epoch host work is only: batch assembly (prefetched on a thread) and
  one tiny (B,)-sized IoU readback per step.

Checkpointing: orbax, best-by-test-mIoU like the reference's
save_best_model (utils/utils.py:208-215) but without the module-global.
"""

from __future__ import annotations

import functools
import logging
import os
import time
from typing import Any, Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vmrframe_tpu.config import Config, Derived
from vmrframe_tpu.metrics import AverageMeter, get_i345_mi
from vmrframe_tpu.registry import ModelEntry, get_model_entry
from vmrframe_tpu.train.optim import build_optimizer

logger = logging.getLogger("vmrframe_tpu")


class TrainState:
    """Minimal train state pytree: params + opt_state + step (+ optional
    ``extras`` for stateful losses, e.g. ActionFormer's EMA loss normalizer,
    reference meta_archs.py:324-326,585-588).

    ``constants`` holds ALL non-param variable collections keyed by
    collection name — frozen 'constants' (GloVe/concept tables) plus mutable
    ones like 'batch_stats' (CCA's BatchNorm running stats)."""

    def __init__(self, params, constants, opt_state, step, extras=None):
        self.params = params
        self.constants = constants
        self.opt_state = opt_state
        self.step = step
        self.extras = {} if extras is None else extras

    def tree_flatten(self):
        return (self.params, self.constants, self.opt_state, self.step, self.extras), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


jax.tree_util.register_pytree_node(
    TrainState, TrainState.tree_flatten, TrainState.tree_unflatten
)


from vmrframe_tpu.parallel import make_mesh  # noqa: E402  (re-export, see parallel/mesh.py)


class Trainer:
    def __init__(
        self,
        cfg: Config,
        derived: Derived,
        word_vectors: np.ndarray,
        mesh: Optional[Mesh] = None,
        entry: Optional[ModelEntry] = None,
    ):
        self.cfg = cfg
        self.derived = derived
        self.entry = entry or get_model_entry(cfg.model.name)
        self.model = self.entry.model_cls(cfg=cfg, derived=derived, word_vectors=word_vectors)
        self.mesh = mesh or make_mesh()
        self.tx = build_optimizer(cfg, max(1, derived.num_train_steps),
                                  frozen_filter=self.entry.frozen_filter,
                                  impl_hint=getattr(self.entry, "optimizer_impl", None))
        # mixed precision: params stay f32; forward runs in compute_dtype
        # (bf16 on the MXU), losses/metrics upcast back to f32
        self.compute_dtype = {
            "float32": jnp.float32, "bfloat16": jnp.bfloat16,
        }[cfg.train.get("compute_dtype", "float32")]
        # dropout mask-bit width (layers/dropout.py): 8 draws one byte per
        # element (4x less raw-bit HBM traffic, drop rate quantized to
        # 1/256), 32 reproduces flax nn.Dropout bit-for-bit.  Read at trace
        # time; set before any step of THIS trainer traces.
        from vmrframe_tpu.layers.dropout import set_default_dropout_bits
        set_default_dropout_bits(int(cfg.train.get("dropout_bits", 8)))
        # depthwise-conv formulation (layers/basic.py): "conv" = XLA grouped
        # conv; "shift" = k shifted multiply-adds; default "shift_train" =
        # mode-split per the round-5 same-session on-chip A/B (BENCH_ZOO
        # SeqPAN vs SeqPAN_shiftconv, measured_round 5: shift wins train
        # 5.86 -> 5.42 ms/step but loses eval 0.82 -> 0.87 — each mode keeps
        # its measured winner, like the banded-kernel mode split).
        from vmrframe_tpu.layers.basic import set_default_depthwise_impl
        set_default_depthwise_impl(str(cfg.train.get("depthwise_impl", "shift_train")))

        self._repl = NamedSharding(self.mesh, P())
        self._batch_shard = NamedSharding(self.mesh, P("data"))
        self._compiled: Dict[str, Any] = {}

    # ---------- init ----------

    def init_state(self, rng: jax.Array, example_batch: Dict[str, np.ndarray]) -> TrainState:
        example = {k: jnp.asarray(v) for k, v in example_batch.items() if k != "num_valid"}
        example = self._maybe_device_pipeline(example)
        variables = self.model.init(
            {"params": rng, "dropout": rng, "gumbel": rng}, example, True
        )
        params = variables["params"]
        constants = {k: v for k, v in variables.items() if k != "params"}
        opt_state = self.tx.init(params)
        extras = self.entry.init_extras(self.cfg) if self.entry.init_extras else {}
        state = TrainState(params, constants, opt_state, jnp.zeros((), jnp.int32), extras)
        if self.entry.init_hook is not None:
            state = self.entry.init_hook(state, self.cfg, self)
        return jax.device_put(state, self._repl)

    # ---------- steps ----------

    def _shard_batch(self, batch: Dict[str, np.ndarray]) -> Dict[str, jnp.ndarray]:
        arrays = {k: v for k, v in batch.items() if k != "num_valid"}
        shardings = {k: (self._batch_shard if np.ndim(v) >= 1 else self._repl)
                     for k, v in arrays.items()}
        return {k: jax.device_put(v, shardings[k]) for k, v in arrays.items()}

    def _maybe_device_pipeline(self, batch):
        """Run the on-device augment/resample/label stage when the batcher
        shipped raw features (ops/input_pipeline.py)."""
        if "raw_vfeats" not in batch:
            return batch
        from vmrframe_tpu.ops.input_pipeline import device_augment_resample

        dp = self.cfg.dataprocess
        aug = dp.video_augmentation
        aug_keys = list(aug.keys())
        aug_mode = aug_keys[0]
        erosion_p = float(aug.get(aug_mode) or 0.05)  # erosion/dilation strength p
        out = device_augment_resample(
            batch["raw_vfeats"], batch["raw_lens"], batch["se_fracs"], batch["pipeline_seed"],
            vlen=self.cfg.model.vlen, aug_mode=aug_mode, erosion_p=erosion_p,
            sample_type=dp.sample_type,
            label_threshold=float(dp.get("label_threshold", 0.01)),
        )
        batch = {k: v for k, v in batch.items()
                 if k not in ("raw_vfeats", "raw_lens", "pipeline_seed")}
        batch.update(out)
        return batch

    def _cast_for_compute(self, tree):
        if self.compute_dtype == jnp.float32:
            return tree
        from vmrframe_tpu.ops.precision import cast_floating

        return cast_floating(tree, self.compute_dtype)

    @staticmethod
    def _upcast_outputs(outputs):
        def up(x):
            if hasattr(x, "dtype") and x.dtype == jnp.bfloat16:
                return x.astype(jnp.float32)
            return x

        return jax.tree_util.tree_map(up, outputs)

    def _train_step(self, state: TrainState, batch, rng) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        cfg, entry, model = self.cfg, self.entry, self.model
        batch = self._maybe_device_pipeline(batch)
        step_rng = jax.random.fold_in(rng, state.step)
        d_rng, g_rng = jax.random.split(step_rng)

        mutable = [k for k in state.constants if k != "constants"]

        def loss_fn(params):
            variables = self._cast_for_compute({"params": params, **state.constants})
            cbatch = self._cast_for_compute(batch)
            rngs = {"dropout": d_rng, "gumbel": g_rng}
            if mutable:
                outputs, mutated = model.apply(variables, cbatch, False, rngs=rngs, mutable=mutable)
            else:
                outputs, mutated = model.apply(variables, cbatch, False, rngs=rngs), {}
            outputs = self._upcast_outputs(outputs)
            if entry.stateful:
                loss, new_extras = entry.loss_fn(outputs, batch, cfg, state.extras)
            else:
                loss, new_extras = entry.loss_fn(outputs, batch, cfg), state.extras
            return loss, (outputs, new_extras, mutated)

        (loss, (outputs, new_extras, mutated)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        new_extras = jax.lax.stop_gradient(new_extras)
        mutated = self._upcast_outputs(jax.lax.stop_gradient(dict(mutated)))
        constants = {**state.constants, **mutated}
        updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params, constants, opt_state, state.step + 1, new_extras)

        props = entry.infer_fn(outputs, batch, cfg)
        from vmrframe_tpu.metrics import iou_device

        ious = iou_device(batch["se_fracs"], props)
        return new_state, {"loss": loss, "ious": ious, "sample_mask": batch["sample_mask"]}

    def _eval_step(self, state: TrainState, batch) -> Dict[str, jnp.ndarray]:
        cfg, entry, model = self.cfg, self.entry, self.model
        batch = self._maybe_device_pipeline(batch)
        variables = self._cast_for_compute({"params": state.params, **state.constants})
        outputs = model.apply(variables, self._cast_for_compute(batch), True)
        outputs = self._upcast_outputs(outputs)
        if entry.stateful:
            loss, _ = entry.loss_fn(outputs, batch, cfg, state.extras)
        else:
            loss = entry.loss_fn(outputs, batch, cfg)
        props = entry.infer_fn(outputs, batch, cfg)
        from vmrframe_tpu.metrics import iou_device

        ious = iou_device(batch["se_fracs"], props)
        return {"loss": loss, "ious": ious, "props": props, "sample_mask": batch["sample_mask"]}

    def compiled_train_step(self):
        if "train" not in self._compiled:
            self._compiled["train"] = jax.jit(
                self._train_step, donate_argnums=(0,),
                out_shardings=(self._repl, None),
            )
        return self._compiled["train"]

    def compiled_eval_step(self):
        if "eval" not in self._compiled:
            self._compiled["eval"] = jax.jit(self._eval_step)
        return self._compiled["eval"]

    # ---------- epoch loops ----------

    def run_train_epoch(self, state, batches: Iterable, rng, lossmeter: Optional[AverageMeter] = None):
        train_step = self.compiled_train_step()
        ious: list = []
        lossmeter = lossmeter or AverageMeter()
        compute_seconds = 0.0
        for batch in batches:
            n_valid = int(batch["num_valid"]) if "num_valid" in batch else None
            device_batch = self._shard_batch(batch)
            t0 = time.perf_counter()
            state, metrics = train_step(state, device_batch, rng)
            loss = float(metrics["loss"])
            batch_ious = np.asarray(metrics["ious"])
            compute_seconds += time.perf_counter() - t0
            if n_valid is not None:
                batch_ious = batch_ious[:n_valid]
            ious.extend(batch_ious.tolist())
            lossmeter.update(loss)
        return state, ious, lossmeter, compute_seconds

    def run_eval_epoch(self, state, batches: Iterable, lossmeter: Optional[AverageMeter] = None,
                       collect_props: bool = False):
        eval_step = self.compiled_eval_step()
        ious: list = []
        props_all: list = []
        lossmeter = lossmeter or AverageMeter()
        compute_seconds = 0.0
        for batch in batches:
            n_valid = int(batch["num_valid"]) if "num_valid" in batch else None
            device_batch = self._shard_batch(batch)
            t0 = time.perf_counter()
            metrics = eval_step(state, device_batch)
            loss = float(metrics["loss"])
            batch_ious = np.asarray(metrics["ious"])
            compute_seconds += time.perf_counter() - t0
            if n_valid is not None:
                batch_ious = batch_ious[:n_valid]
            ious.extend(batch_ious.tolist())
            if collect_props:
                props = np.asarray(metrics["props"])
                props_all.append(props[:n_valid] if n_valid is not None else props)
            lossmeter.update(loss)
        if collect_props:
            return ious, lossmeter, compute_seconds, np.concatenate(props_all) if props_all else np.zeros((0, 2))
        return ious, lossmeter, compute_seconds


def fit(trainer: Trainer, train_batcher, test_batcher, rng_seed: int = 1234,
        ckpt_dir: Optional[str] = None, log=print,
        resume_from: Optional[str] = None) -> Dict[str, Any]:
    """Full training run mirroring main.py:75-153: per-epoch train pass with
    train metrics, then a full test pass, best checkpoint by test mIoU.
    ``resume_from`` restores a prior checkpoint (params + opt state/step when
    present) before training, like the reference's --checkpoint
    (main.py:26-28)."""
    from vmrframe_tpu.data.batcher import BatchPrefetcher

    cfg, derived = trainer.cfg, trainer.derived
    rng = jax.random.PRNGKey(rng_seed)
    first = next(train_batcher.epoch(seed=rng_seed))
    state = trainer.init_state(rng, first)
    # per-step dropout/gumbel streams: the TPU-native rbg generator — the
    # counter-based threefry mask generation measured 1.45 ms of SeqPAN's
    # train step at B=128 vs 0.70 ms for rbg (docs/PROFILE_SEQPAN_TRAIN.json).
    # Param init above stays threefry (init distributions unchanged).
    impl = str(cfg.train.get("prng_impl", "rbg"))
    train_rng = rng if impl in ("threefry", "threefry2x32") \
        else jax.random.key(rng_seed, impl=impl)
    if resume_from:
        from vmrframe_tpu.train.checkpoints import restore_into_state

        state = jax.device_put(restore_into_state(resume_from, state), trainer._repl)
        log(f"resumed from {resume_from} at step {int(state.step)}")

    import contextlib
    import os

    profile_dir = os.environ.get("VMRFRAME_TPU_PROFILE_DIR")

    best_miou, best_path = -1.0, None
    history = []
    for epoch in range(cfg.train.epochs):
        t_epoch = time.time()
        # optional jax profiler trace for one epoch (the replacement for the
        # reference's cuda.synchronize timing brackets, SeqPAN.py:51-87)
        trace = (jax.profiler.trace(profile_dir) if profile_dir and epoch == 0
                 else contextlib.nullcontext())
        with trace:
            batches = BatchPrefetcher(train_batcher.epoch(seed=rng_seed + epoch))
            state, ious, lossmeter, secs = trainer.run_train_epoch(state, batches, train_rng)
        n_train = train_batcher.num_samples
        r1i3, r1i5, _, r1i7, mi = get_i345_mi(ious)
        log(f"TRAIN {epoch + 1:2d}|{cfg.train.epochs:2d} R1I3: {r1i3:.2f}\tR1I5: {r1i5:.2f}\t"
            f"R1I7: {r1i7:.2f}\tmIoU: {mi:.2f}\tloss: {lossmeter.avg:.4f}\t"
            f"step_s: {secs / max(1, len(train_batcher)):.4f}\t"
            f"samples/s: {n_train / max(secs, 1e-9):.0f}")

        batches = BatchPrefetcher(test_batcher.epoch(seed=0))
        ious, lossmeter, secs = trainer.run_eval_epoch(state, batches)
        r1i3, r1i5, _, r1i7, mi = get_i345_mi(ious)
        log(f"TEST  {epoch + 1:2d}|{cfg.train.epochs:2d} R1I3: {r1i3:.2f}\tR1I5: {r1i5:.2f}\t"
            f"R1I7: {r1i7:.2f}\tmIoU: {mi:.2f}\tloss: {lossmeter.avg:.4f}\t"
            f"eval_qps: {test_batcher.num_samples / max(secs, 1e-9):.0f}\t"
            f"epoch_s: {time.time() - t_epoch:.1f}")
        history.append({"epoch": epoch + 1, "r1i3": r1i3, "r1i5": r1i5, "r1i7": r1i7, "miou": mi})

        if ckpt_dir:
            from vmrframe_tpu.train.checkpoints import save_checkpoint

            # rolling full checkpoint (params + opt state) for exact resume
            save_checkpoint(ckpt_dir, state, name=f"last_{cfg.model.name}", full=True)
        if mi > best_miou:
            best_miou = mi
            if ckpt_dir:
                best_path = save_checkpoint(ckpt_dir, state, name=f"best_{cfg.model.name}")
                log(f"*** saved best checkpoint to {best_path}, mIoU={mi:.2f} ***")

    return {"state": state, "best_miou": best_miou, "best_path": best_path, "history": history}
