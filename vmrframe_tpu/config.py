"""Config system.

Reads the reference's YAML config files unchanged (they are YAML/JSON
hybrids, cf. config/charades/SeqPAN.yaml and utils/utils.py:37-39 in the
reference) into an immutable-by-convention attribute tree.  Unlike the
reference — which mutates the loaded EasyDict at runtime (main.py:45-66) —
derived quantities (vocab sizes, train-step counts, device info) live in a
separate ``Derived`` record so the user-authored config stays pristine.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict

import yaml


class Config:
    """Attribute-access view over a nested dict (read-only by convention).

    Replaces the reference's EasyDict.  ``cfg.model.dim`` etc.  Missing keys
    raise AttributeError with the full dotted path for fast debugging.
    """

    def __init__(self, data: Dict[str, Any], _path: str = ""):
        object.__setattr__(self, "_data", {})
        object.__setattr__(self, "_path", _path)
        for k, v in data.items():
            if isinstance(v, dict):
                v = Config(v, _path=f"{_path}.{k}" if _path else str(k))
            self._data[k] = v

    def __getattr__(self, name: str) -> Any:
        data = object.__getattribute__(self, "_data")
        if name in data:
            return data[name]
        path = object.__getattribute__(self, "_path")
        raise AttributeError(f"config key not found: {path + '.' if path else ''}{name}")

    def __setattr__(self, name: str, value: Any) -> None:
        raise AttributeError("Config is read-only; use .updated() to derive a new one")

    def __contains__(self, name: str) -> bool:
        return name in self._data

    def __getitem__(self, name: str) -> Any:
        return self._data[name]

    def get(self, name: str, default: Any = None) -> Any:
        return self._data.get(name, default)

    def keys(self):
        return self._data.keys()

    def to_dict(self) -> Dict[str, Any]:
        out = {}
        for k, v in self._data.items():
            out[k] = v.to_dict() if isinstance(v, Config) else v
        return out

    def updated(self, updates: Dict[str, Any]) -> "Config":
        """Return a new Config with (possibly nested, dot-keyed) updates."""
        data = self.to_dict()
        for key, value in updates.items():
            node = data
            parts = key.split(".")
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = value
        return Config(data)

    def __repr__(self) -> str:
        return f"Config({json.dumps(self.to_dict(), indent=2, default=str)})"


@dataclasses.dataclass
class Derived:
    """Runtime-derived quantities (the reference mutates these into its
    config object at main.py:45-66; we keep them separate and explicit)."""

    suffix: str = ""
    seed: int = 1234
    num_words: int = 0
    num_chars: int = 0
    num_train_steps: int = 0
    steps_per_epoch: int = 0
    debug: bool = False
    # static char-sequence width (the reference pads chars dynamically to the
    # longest word in the batch, utils/data_utils.py:55-66; TPU needs a fixed
    # width — 16 covers >99.9% of GloVe-vocab words)
    char_len: int = 16


def load_config(path: str) -> Config:
    """Load a reference-format YAML (or JSON) config file."""
    with open(path, encoding="utf8") as fr:
        if path.endswith(".json"):
            data = json.load(fr)
        else:
            data = yaml.safe_load(fr)
    if not isinstance(data, dict):
        raise ValueError(f"config file {path} did not parse to a mapping")
    return Config(data)


def default_char_len(cfg: Config) -> int:
    return int(cfg.get("dataprocess", Config({})).get("char_len", 16)) if "dataprocess" in cfg else 16
