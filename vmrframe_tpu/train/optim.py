"""Optimizer: AdamW + linear-warmup-linear-decay + global-norm clipping.

Reproduces the reference's build_optimizer_and_scheduler
(utils/utils.py:87-97): torch AdamW (betas 0.9/0.999, eps 1e-8) with
weight_decay 0.01 masked off for parameters whose name contains 'bias' or
'layer_norm', and HuggingFace get_linear_schedule_with_warmup.  Gradient
clipping happens before the update like main.py:95.
"""

from __future__ import annotations

from typing import Any

import jax
import optax


def linear_warmup_decay(base_lr: float, num_train_steps: int, warmup_proportion: float):
    """HF get_linear_schedule_with_warmup semantics, exactly as the reference
    drives it: utils/utils.py:96 passes ``num_train_steps * warmup_proportion``
    as a FLOAT (no rounding), and HF's lambda keeps it float — so warmup can
    be fractional (e.g. 1.2 steps) and the decay denominator is the float
    ``total - warmup``.  Verified against torch step-for-step in
    tests/test_reference_trainer_parity.py."""
    warmup_steps = float(num_train_steps * warmup_proportion)

    def schedule(step):
        import jax.numpy as jnp

        step = jnp.asarray(step, dtype=jnp.float32)
        warm = step / jnp.maximum(1.0, warmup_steps)
        decay = jnp.maximum(
            0.0,
            (num_train_steps - step) / jnp.maximum(1.0, float(num_train_steps) - warmup_steps),
        )
        return base_lr * jnp.where(step < warmup_steps, warm, decay)

    return schedule


def _decay_mask(params) -> Any:
    """True (apply weight decay) unless the param path contains 'bias' or
    'layer_norm' (the reference's no_decay list, utils/utils.py:89).

    The reference groups by TORCH PARAMETER NAME, so parity is name-mapped:
    the CPL decoder's norms are torch ``*_attn_layer_norm.weight`` /
    ``final_layer_norm.weight`` (cpl_lib.py:262-267 — no decay), which we
    name ``self_ln_scale``/``enc_ln_scale``/``final_ln_scale``; whereas e.g.
    ActionFormer's ``ln1.weight`` and CCA's transformer ``norm1.weight``
    DON'T match the reference's list and stay decayed — quirk preserved."""
    no_decay = ("bias", "layer_norm", "self_ln_", "enc_ln_", "final_ln_")

    def mask_from_path(path, _):
        names = [str(getattr(k, "key", k)).lower() for k in path]
        joined = "/".join(names)
        return not any(tok in joined for tok in no_decay)

    return jax.tree_util.tree_map_with_path(mask_from_path, params)


def build_optimizer(cfg, num_train_steps: int, frozen_filter=None) -> optax.GradientTransformation:
    """``frozen_filter('path/to/param') -> True`` pins that param (zero
    updates) — the equivalent of the reference's requires_grad=False teacher
    freezing (e.g. OneTeacher_SoftLabel.py:42-44)."""
    schedule = linear_warmup_decay(cfg.train.lr, num_train_steps, cfg.train.warmup_proportion)
    adamw = optax.adamw(
        learning_rate=schedule,
        b1=0.9,
        b2=0.999,
        eps=1e-8,
        weight_decay=0.01,
        mask=_decay_mask,
    )
    if frozen_filter is not None:
        def labels(params):
            def lab(path, _):
                joined = "/".join(str(getattr(k, "key", k)) for k in path)
                return "frozen" if frozen_filter(joined) else "train"

            return jax.tree_util.tree_map_with_path(lab, params)

        adamw = optax.multi_transform({"train": adamw, "frozen": optax.set_to_zero()}, labels)
    return optax.chain(optax.clip_by_global_norm(cfg.train.clip_norm), adamw)
