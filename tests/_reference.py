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


def _patch_tensor_to_cuda_noop():
    """`.to("cuda")` -> identity on a CPU-only torch build (reference
    SparseMaxPool pins its mask to cuda at construction, CCA.py:205)."""
    import torch

    orig = torch.Tensor.to

    def to(self, *args, **kwargs):
        if args and (args[0] == "cuda"
                     or (isinstance(args[0], torch.device) and args[0].type == "cuda")):
            args = ("cpu",) + args[1:]
        if kwargs.get("device") == "cuda":
            kwargs = dict(kwargs, device="cpu")
        return orig(self, *args, **kwargs)

    torch.Tensor.to = to


def load_cpl():
    """Import the reference ``models.cpl_lib`` + ``models.model`` (CPL),
    papering over (test-side only, math unchanged):

    - ``from fairseq import utils`` inside MultiheadAttention.forward
      (cpl_lib.py:186) — stubbed with utils.softmax == F.softmax;
    - ``.cuda()`` on the start-token buffer (model.py:135) on a CPU-only
      build — ``torch.Tensor.cuda`` becomes identity.

    Returns (cpl_lib_module, model_module)."""
    install()
    import torch

    if "fairseq" not in sys.modules:
        import torch.nn.functional as F

        fairseq = types.ModuleType("fairseq")
        utils_mod = types.ModuleType("fairseq.utils")
        utils_mod.softmax = lambda x, dim=-1, onnx_trace=False: F.softmax(x, dim=dim)
        fairseq.utils = utils_mod
        sys.modules["fairseq"] = fairseq
        sys.modules["fairseq.utils"] = utils_mod
    if not torch.cuda.is_available():
        torch.Tensor.cuda = lambda self, *a, **k: self
    lib = importlib.import_module("models.cpl_lib")
    model = importlib.import_module("models.model")
    return lib, model


_CCA_FAKE: dict = {}


def load_cca():
    """Import the reference ``models.CCA``, papering over (test-side only,
    math unchanged):

    - import-time pickle loads from hard-coded absolute paths
      (CCA.py:395-397) — served deterministic fake concept data via a
      temporary ``builtins.open`` intercept;
    - ``np.int`` (removed in numpy>=1.24; CCA.py:31);
    - ``.to("cuda")`` on a CPU-only build (CCA.py:205).

    Returns (module, fake) where fake = {"attr_emb": (6, 300) float32,
    "com_dict": {name: (300,)} of 4} — ``concept_input_embs`` in the
    reference module becomes their (10, 300) concatenation.
    """
    install()
    import numpy as np

    if not hasattr(np, "int"):
        np.int = int  # noqa: NPY001 — reference CCA.py:31 uses the removed alias
    import torch

    if not torch.cuda.is_available():
        _patch_tensor_to_cuda_noop()
    if not _CCA_FAKE:
        rng = np.random.default_rng(11)
        _CCA_FAKE["attr_emb"] = rng.standard_normal((6, 300)).astype(np.float32)
        _CCA_FAKE["com_dict"] = {
            f"c{i}": rng.standard_normal(300).astype(np.float32) for i in range(4)
        }
    if "models.CCA" in sys.modules:
        return sys.modules["models.CCA"], _CCA_FAKE

    import builtins
    import io
    import pickle

    blobs = {
        "/storage/rjliang/4_FastVMR/CCA/acnet_concept/acnet_concepts_glove_word2vec.pkl":
            pickle.dumps(_CCA_FAKE["attr_emb"]),
        "/storage/rjliang/4_FastVMR/CCA/acnet_concept/acnet_test_concepts.pkl":
            pickle.dumps(_CCA_FAKE["com_dict"]),
    }
    real_open = builtins.open

    def fake_open(path, *a, **k):
        blob = blobs.get(str(path))
        if blob is not None:
            return io.BytesIO(blob)
        return real_open(path, *a, **k)

    builtins.open = fake_open
    try:
        mod = importlib.import_module("models.CCA")
    finally:
        builtins.open = real_open
    return mod, _CCA_FAKE
