"""Native (C++) runtime components, bound via ctypes.

Currently: the 1D NMS / Soft-NMS CPU kernel (nms_1d.cpp) — the behavioral
twin of the reference's absent-source `nms_1d_cpu` extension
(models/ActionFormerlib/actionformer_utils.py:5).  It cross-checks the
on-device jax NMS and serves hosts without an accelerator.

The shared library is compiled on first use with g++ and cached next to the
source; set VMRFRAME_TPU_NO_NATIVE=1 to disable compilation entirely.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "nms_1d.cpp")
_LIB_PATH = os.path.join(_HERE, "libnms_1d.so")
_lib: Optional[ctypes.CDLL] = None
_load_error: Optional[str] = None


def _build() -> None:
    subprocess.run(
        ["g++", "-O2", "-shared", "-fPIC", "-o", _LIB_PATH, _SRC],
        check=True,
        capture_output=True,
    )


def _get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _load_error
    if _lib is not None or _load_error is not None:
        return _lib
    if os.environ.get("VMRFRAME_TPU_NO_NATIVE"):
        _load_error = "disabled via VMRFRAME_TPU_NO_NATIVE"
        return None
    try:
        if not os.path.exists(_LIB_PATH) or os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC):
            _build()
        lib = ctypes.CDLL(_LIB_PATH)
        lib.nms_1d.restype = ctypes.c_int
        lib.nms_1d.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int, ctypes.c_float, ctypes.c_float, ctypes.c_int,
            ctypes.c_float, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_float),
        ]
        _lib = lib
    except Exception as e:  # pragma: no cover - toolchain missing
        _load_error = str(e)
    return _lib


def native_available() -> bool:
    return _get_lib() is not None


def nms_1d_cpu(
    segs: np.ndarray,
    scores: np.ndarray,
    iou_threshold: float,
    min_score: float = 0.001,
    method: int = 2,
    sigma: float = 0.5,
    max_keep: int = 100,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Run the C++ kernel on (N, 2) float32 segments + (N,) scores.

    method: 0 = hard, 1 = linear soft, 2 = gaussian soft.
    Returns (kept_segs, kept_scores, kept_idx).
    """
    lib = _get_lib()
    if lib is None:
        raise RuntimeError(f"native nms unavailable: {_load_error}")
    segs = np.ascontiguousarray(segs, dtype=np.float32)
    scores = np.ascontiguousarray(scores, dtype=np.float32)
    n = segs.shape[0]
    keep_idx = np.zeros(max_keep, dtype=np.int32)
    keep_scores = np.zeros(max_keep, dtype=np.float32)
    count = lib.nms_1d(
        segs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        scores.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n, iou_threshold, min_score, method, sigma, max_keep,
        keep_idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        keep_scores.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    idx = keep_idx[:count]
    return segs[idx], keep_scores[:count], idx
