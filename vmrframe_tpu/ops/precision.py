"""Mixed-precision cast policy.

Under a bfloat16 compute policy the matmul/conv operands (activations and
rank>=2 weights) carry the arithmetic and the bytes, so they are cast down;
rank<=1 floating parameters (conv biases, LayerNorm scales/biases, scalar
blend weights) stay f32.  Two reasons, both measured on the v5e eval step:

1. XLA runs reductions/normalizations internally in f32 anyway, so a bf16
   vector param feeding an f32 fusion costs a standalone ``convert`` kernel
   that the while-loop scheduler SINKS into the steady-state body — ~60 such
   1.5 us launches per step at the headline config (docs/hlo_eval_B128.txt
   census).  Keeping the vector f32 deletes the kernel, not just the bytes.
2. Bias/scale precision is free accuracy: the tensors are tiny (no HBM or
   MXU cost) and the add/scale happens inside an existing fusion.

The model layers harmonize dtypes locally (see ``biased``): the affine math
runs in the wider dtype inside the fusion and the RESULT is cast back to the
activation dtype, so f32 vector params never promote downstream matmuls.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cast_floating(tree, dtype, keep_vector_f32: bool = True):
    """Cast floating-point leaves of ``tree`` to ``dtype``.

    With ``keep_vector_f32`` (the default) leaves of rank<=1 keep their
    original dtype when casting DOWN to bfloat16 — the vector-parameter
    policy documented above.  Non-floating leaves (ids, masks stored as
    ints, PRNG keys) pass through untouched.
    """
    if dtype == jnp.float32:
        keep_vector_f32 = False

    def cast(x):
        if not (hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)):
            return x
        if keep_vector_f32 and getattr(x, "ndim", 0) <= 1:
            return x
        return x.astype(dtype)

    return jax.tree_util.tree_map(cast, tree)


def biased(y, bias):
    """``y + bias`` in the wider dtype, result cast back to ``y.dtype``.

    When param and activation dtypes already agree this is a plain add.
    When the bias is f32 and y is bf16, the add runs in f32 (inside the
    consumer fusion — free) and the result converts back so downstream
    matmuls stay in the compute dtype.
    """
    out = y + bias
    return out.astype(y.dtype) if out.dtype != y.dtype else out
