"""Explicit model registry.

Replaces the reference's ``eval()``-based dispatch (main.py:21,87,99;
utils/DataLoader.py:5-6) with a plain dict keyed by model name.  Each entry
bundles everything the trainer needs for one model family:

- ``model_cls``      : flax.linen module class, constructed as
                       ``model_cls(cfg=config, derived=derived, word_vectors=...)``
- ``dataset_cls``    : host-side dataset (produces per-sample dicts)
- ``batcher_cls``    : static-shape batch assembler (collate equivalent)
- ``train_step_fn``  : pure fn (model, params, batch, rng, cfg) -> (loss, aux)
                       used inside the jitted trainer step
- ``infer_fn``       : pure fn (outputs, batch, cfg) -> (B, 2) predicted fracs
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional

MODEL_REGISTRY: Dict[str, "ModelEntry"] = {}


@dataclasses.dataclass
class ModelEntry:
    name: str
    model_cls: Any
    dataset_cls: Any = None
    batcher_cls: Any = None
    loss_fn: Optional[Callable] = None
    infer_fn: Optional[Callable] = None
    # optional: model-specific config validation / defaults
    config_hook: Optional[Callable] = None
    # stateful losses (e.g. ActionFormer's EMA loss normalizer):
    # loss_fn(outputs, batch, cfg, extras) -> (loss, new_extras)
    stateful: bool = False
    init_extras: Optional[Callable] = None  # (cfg) -> extras pytree
    # distillation support: params whose dotted path matches frozen_filter
    # get zero optimizer updates (frozen teachers); init_hook runs once after
    # init_state to e.g. load pretrained teacher checkpoints into the state
    frozen_filter: Optional[Callable] = None  # (path_str) -> bool
    init_hook: Optional[Callable] = None  # (state, cfg, trainer) -> state
    # measured per-family AdamW implementation hint for train.flat_optimizer
    # "auto" (see train/optim.py::build_optimizer): "tree" routes to the
    # optax per-leaf chain; None/"flat" to the raveled single-buffer form
    optimizer_impl: Optional[str] = None


def register_model(name: str, **kwargs):
    """Class decorator: ``@register_model("SeqPAN", loss_fn=..., infer_fn=...)``."""

    def wrap(model_cls):
        entry = ModelEntry(name=name, model_cls=model_cls, **kwargs)
        MODEL_REGISTRY[name] = entry
        model_cls._registry_name = name
        return model_cls

    return wrap


def get_model_entry(name: str) -> ModelEntry:
    # Import the zoo lazily so registration side effects run exactly once.
    import vmrframe_tpu.models  # noqa: F401

    if name not in MODEL_REGISTRY:
        raise KeyError(
            f"unknown model {name!r}; registered: {sorted(MODEL_REGISTRY)}"
        )
    return MODEL_REGISTRY[name]
