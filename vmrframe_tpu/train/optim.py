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


def _frozen_mask_tree(params, frozen_filter):
    def lab(path, _):
        joined = "/".join(str(getattr(k, "key", k)) for k in path)
        return bool(frozen_filter(joined))

    return jax.tree_util.tree_map_with_path(lab, params)


def flat_adamw(cfg, num_train_steps: int, frozen_filter=None) -> optax.GradientTransformation:
    """clip + AdamW + schedule on ONE raveled parameter buffer.

    Numerically the same elementwise math as the optax tree chain in
    ``tree_adamw`` (global-norm accumulation order aside), but the whole
    optimizer is ~10 large kernels instead of several per parameter leaf.
    Measured on v5e at SeqPAN B=128: the tree chain added 5.5 ms to the
    3.9 ms loss+grad step — the optimizer was 58% of training — because
    ~150 leaves x several ops each run as hundreds of tiny serialized
    kernels.  Exactness vs the tree path: tests/test_optim.py.

    Per-leaf semantics preserved: the reference's no-decay name list via a
    flat 0/1 decay mask, frozen params (requires_grad=False equivalent) get
    zero updates AND zero moments, and frozen gradients still count toward
    the clip norm (the tree chain clips before partitioning too).

    State layout: ``{count, mu, nu[, keep]}`` — only the frozen-param
    ``keep`` mask (uint8, structure-static) lives in the state, and only
    when a ``frozen_filter`` is given.  Weight decay needs no mask buffer
    at all: decay/frozen are STATIC per-leaf properties (the reference
    groups by torch parameter name, whole leaves), so ``update`` applies
    ``u - lr*wd*p`` per leaf AFTER the unravel, fused into apply_updates'
    existing add.  The earlier flat ``decay`` mask + whole-params ravel
    were measured pure HBM traffic (78 us/step at SeqPAN dims,
    docs/TRACE_SEQPAN_TRAIN.json) and removed; checkpoints written with
    that layout are key-matched on restore (checkpoints.py drops the
    legacy 'decay' leaf with a warning).  Measured caveat (round-4
    on-chip A/B, docs/BENCH_ZOO.json ActionFormer_flatfix): masks-at-init
    vs per-update rebuild recovered ~nothing — XLA constant-folds the
    mask construction; the REAL O(params) per-step cost of the flat
    design is the grad-ravel concat and the update unravel slices, which
    is why ``build_optimizer``'s "auto" hands big trees to
    ``tree_adamw``."""
    import jax.numpy as jnp
    from jax.flatten_util import ravel_pytree

    schedule = linear_warmup_decay(cfg.train.lr, num_train_steps, cfg.train.warmup_proportion)
    clip_norm = float(cfg.train.clip_norm)
    b1, b2, eps, wd = 0.9, 0.999, 1e-8, 0.01

    def _flat_masks(params):
        decay = _decay_mask(params)
        ones = jax.tree_util.tree_map(
            lambda m, p: jnp.full(p.shape, 1 if m else 0, jnp.uint8),
            decay, params)
        decay_flat = ravel_pytree(ones)[0]
        if frozen_filter is None:
            keep_flat = None
        else:
            frozen = _frozen_mask_tree(params, frozen_filter)
            keep = jax.tree_util.tree_map(
                lambda m, p: jnp.full(p.shape, 0 if m else 1, jnp.uint8),
                frozen, params)
            keep_flat = ravel_pytree(keep)[0]
        return decay_flat, keep_flat

    def init(params):
        flat, _ = ravel_pytree(params)
        _, keep_flat = _flat_masks(params)
        # mu and nu must be DISTINCT buffers: the train step donates the
        # whole state, and aliased leaves trip "donate the same buffer
        # twice" at execute time.  keep passes through update unchanged
        # (donated input aliases straight to output).
        state = {"count": jnp.zeros([], jnp.int32),
                 "mu": jnp.zeros_like(flat, dtype=jnp.float32),
                 "nu": jnp.zeros_like(flat, dtype=jnp.float32)}
        if keep_flat is not None:
            state["keep"] = keep_flat
        return state

    def update(grads, state, params=None):
        assert params is not None, "flat_adamw needs params (weight decay)"
        gflat, unravel = ravel_pytree(grads)
        gflat = gflat.astype(jnp.float32)
        keep_flat = state["keep"].astype(jnp.float32) if "keep" in state else None

        # optax.clip_by_global_norm semantics (norm over ALL grads,
        # frozen included — matches clip-before-partition in the tree path)
        gnorm = jnp.sqrt(jnp.sum(gflat * gflat))
        g = jnp.where(gnorm < clip_norm, gflat, gflat / gnorm * clip_norm)
        if keep_flat is not None:
            g = g * keep_flat  # frozen moments stay exactly zero

        count = state["count"] + 1
        mu = b1 * state["mu"] + (1.0 - b1) * g
        nu = b2 * state["nu"] + (1.0 - b2) * (g * g)
        c = count.astype(jnp.float32)
        mu_hat = mu / (1.0 - b1 ** c)
        nu_hat = nu / (1.0 - b2 ** c)
        lr = schedule(count - 1)  # optax scale_by_schedule: pre-increment step
        adam = -lr * (mu_hat / (jnp.sqrt(nu_hat) + eps))
        if keep_flat is not None:
            adam = adam * keep_flat
        # Weight decay happens PER LEAF after the unravel, not on a raveled
        # param copy: the per-step ravel_pytree(params) concat was pure HBM
        # traffic (measured 78 us/step at SeqPAN dims, the #4 line of
        # docs/TRACE_SEQPAN_TRAIN.json), while ``u - lr*wd*p`` fuses into
        # apply_updates' existing per-leaf add — same kernel count, one
        # whole-params concat and the flat decay-mask buffer both gone.
        # Decay/frozen per leaf are STATIC functions of the tree structure
        # (the whole leaf is decayed or not — the reference groups by torch
        # parameter name), so no mask buffers are needed at all.
        upd = unravel(adam)
        decay_tree = _decay_mask(params)
        frozen_tree = (_frozen_mask_tree(params, frozen_filter)
                       if frozen_filter is not None else
                       jax.tree_util.tree_map(lambda _: False, params))
        upd = jax.tree_util.tree_map(
            lambda u, p, d, f: u - (lr * wd * p.astype(u.dtype)) if (d and not f) else u,
            upd, params, decay_tree, frozen_tree)
        new_state = {"count": count, "mu": mu, "nu": nu}
        if "keep" in state:
            new_state["keep"] = state["keep"]
        return upd, new_state

    return optax.GradientTransformation(init, update)


def tree_adamw(cfg, num_train_steps: int, frozen_filter=None) -> optax.GradientTransformation:
    """The optax per-leaf chain (reference semantics, slower on TPU — see
    ``flat_adamw``)."""
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


def build_optimizer(cfg, num_train_steps: int, frozen_filter=None,
                    impl_hint=None) -> optax.GradientTransformation:
    """``frozen_filter('path/to/param') -> True`` pins that param (zero
    updates) — the equivalent of the reference's requires_grad=False teacher
    freezing (e.g. OneTeacher_SoftLabel.py:42-44).

    ``train.flat_optimizer``: true forces the raveled single-buffer
    implementation, false the optax tree chain; the default "auto" follows
    ``impl_hint`` (a per-family registry annotation) and otherwise flat.
    The hint is MEASURED, not derived — round-4 same-session on-chip A/Bs
    (docs/BENCH_ZOO.json): tree wins for the big-leaf families —
    ActionFormer (11.8 → 8.8 ms/step, 27.6M params), BAN (26.8 → 23.5,
    33.9M), CCA (62.7 → 57.1, 59.1M) — where the flat ravel/unravel
    concats are pure extra HBM traffic dwarfing per-leaf dispatch; flat
    keeps SeqPAN/CPL (hundreds of tiny leaves → per-leaf kernel spam is
    the larger cost, r3 measurement)."""
    if hasattr(cfg.train, "get"):
        flat = cfg.train.get("flat_optimizer", "auto")
    else:  # plain-namespace cfgs (tests)
        flat = getattr(cfg.train, "flat_optimizer", "auto")
    if isinstance(flat, str) and flat.lower() == "auto":
        flat = impl_hint != "tree"
    if bool(flat):
        return flat_adamw(cfg, num_train_steps, frozen_filter)
    return tree_adamw(cfg, num_train_steps, frozen_filter)
