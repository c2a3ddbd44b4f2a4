"""Import the ACTUAL reference PyTorch modules from /root/reference.

The reference's ``models/__init__.py`` imports CCA, which loads concept
pickles from hard-coded absolute paths at import time (reference
models/CCA.py:395-397) — so ``import models`` fails on any machine but the
author's.  We bypass the package ``__init__`` by registering a namespace
stub whose ``__path__`` points at the reference tree: submodule imports
(``models.layers``, ``models.loss``, ``models.BANlib.model``, …) then load
the real files without executing ``models/__init__.py``.

Also papered over, test-side only:
- ``models/layers.py:2-3`` imports ``pyexpat.model`` / ``tkinter.Y``
  (dead imports); tkinter may be absent on a headless box → stubbed.
- ``torch.cuda.synchronize()`` timing brackets (e.g. reference
  models/SeqPAN.py:51,85) raise on a CPU-only torch build → no-op'd.

Nothing here changes the reference's math.
"""

from __future__ import annotations

import importlib
import sys
import types

REF_ROOT = "/root/reference"

_installed = False


def install():
    """Make `models.*` and `utils.*` of the reference importable. Idempotent."""
    global _installed
    if _installed:
        return
    # tkinter stub for models/layers.py:3 (headless image)
    try:
        import tkinter  # noqa: F401
    except Exception:
        tk = types.ModuleType("tkinter")
        tk.Y = None
        sys.modules["tkinter"] = tk

    import torch

    if not torch.cuda.is_available():
        torch.cuda.synchronize = lambda *a, **k: None  # timing brackets only

    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)

    # namespace stub: submodules resolve against the reference tree but the
    # side-effecting models/__init__.py never runs
    models_pkg = types.ModuleType("models")
    models_pkg.__path__ = [f"{REF_ROOT}/models"]
    sys.modules["models"] = models_pkg
    _installed = True


def load(dotted: str):
    """Import e.g. 'models.layers' or 'utils.engine' from the reference."""
    install()
    return importlib.import_module(dotted)
