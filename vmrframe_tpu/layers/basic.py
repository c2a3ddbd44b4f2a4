"""Basic layer library (flax.linen).

TPU-native re-implementation of the QANet/VSLNet-style building blocks the
reference keeps in models/layers.py.  Design notes:

- the reference's ``Conv1D`` (models/layers.py:15-26) is a pointwise conv
  used as a Linear over (B, L, D) — here it IS a Dense (one MXU matmul);
- parameters initialize like their torch counterparts (Lecun/Kaiming-uniform
  conv defaults → we use the torch fan-in uniform so converted checkpoints
  and from-scratch runs share scale);
- frozen GloVe vectors live in the ``constants`` variable collection, not
  ``params`` — the optimizer never sees them (reference freezes them via
  requires_grad=False, models/layers.py:28-48);
- every dropout site takes the shared 'dropout' PRNG stream and a
  ``deterministic`` flag (train vs the reference's model.eval()).
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from vmrframe_tpu.layers.dropout import Dropout

from vmrframe_tpu.ops.precision import biased


def torch_linear_init(key, shape, dtype=jnp.float32):
    """torch nn.Linear/Conv1d default: U(-1/sqrt(fan_in), 1/sqrt(fan_in)).

    For a Dense kernel of shape (in, out), fan_in = in.
    """
    fan_in = shape[0]
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def torch_bias_init_for(fan_in: int) -> Callable:
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return init


class Conv1D(nn.Module):
    """Pointwise projection over (B, L, D) — the reference's Conv1D with
    kernel_size=1 (models/layers.py:15-26) expressed as a single Dense."""

    out_dim: int
    use_bias: bool = True
    activation: Optional[Callable] = None

    @nn.compact
    def __call__(self, x):
        in_dim = x.shape[-1]
        kernel = self.param("kernel", torch_linear_init, (in_dim, self.out_dim))
        import os

        if os.environ.get("VMR_MM2D"):  # layout experiment: canonical 2D GEMM
            y = (x.reshape(-1, in_dim) @ kernel).reshape(*x.shape[:-1], self.out_dim)
        else:
            y = jnp.einsum("bld,do->blo", x, kernel)
        if self.use_bias:
            bias = self.param("bias", torch_bias_init_for(in_dim), (self.out_dim,))
            y = biased(y, bias)
        if self.activation is not None:
            y = self.activation(y)
        return y


class LayerNorm(nn.Module):
    """LayerNorm with torch semantics (eps inside sqrt), eps=1e-6 to match
    the reference's nn.LayerNorm(dim, eps=1e-6)."""

    epsilon: float = 1e-6

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (dim,))
        bias = self.param("bias", nn.initializers.zeros, (dim,))
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
        y = (x - mean) * jax.lax.rsqrt(var + self.epsilon)
        out = y * scale + bias
        # under the vector-param policy (ops/precision.py) scale/bias may be
        # f32 while x is bf16: the affine runs f32 inside the fusion, the
        # result returns to the activation dtype
        return out.astype(x.dtype) if out.dtype != x.dtype else out


def embedding_lookup(table: jnp.ndarray, ids: jnp.ndarray,
                     one_hot_max: int = 8192) -> jnp.ndarray:
    """Row gather ``table[ids]`` expressed TPU-natively.

    XLA lowers a dynamic gather on TPU to scalar-indexed loads that dominate
    the whole text front end at serving batch sizes (measured: the char-table
    gather alone cost 0.40 ms at B=512 while a one-hot matmul on the MXU
    measures below timer resolution at the same shape — round-3 batch-scaling
    profile, docs/PROFILE_BATCH.json).  A one-hot matmul is numerically
    EXACT here (one nonzero per row, so no accumulation), grads included
    (scatter-add == oh^T @ g).  Falls back to ``jnp.take`` for vocabularies
    large enough that materializing the one-hot would cost more than the
    gather."""
    V = table.shape[0]
    if V <= one_hot_max:
        oh = jax.nn.one_hot(ids, V, dtype=table.dtype)
        return jnp.einsum("...v,vd->...d", oh, table)
    return jnp.take(table, ids, axis=0)


class WordEmbedding(nn.Module):
    """Frozen GloVe + trainable UNK + zero PAD (models/layers.py:28-48).

    ``word_vectors`` (N, word_dim) goes into the ``constants`` collection;
    only the UNK row is a parameter.
    """

    word_dim: int
    word_vectors: Any  # numpy (N, word_dim)
    droprate: float = 0.0

    @nn.compact
    def __call__(self, word_ids, deterministic: bool = True):
        unk = self.param(
            "unk_vec", nn.initializers.xavier_uniform(), (1, self.word_dim)
        )
        glove = self.variable(
            "constants", "glove_vec",
            lambda: jnp.asarray(np.asarray(self.word_vectors, dtype=np.float32)),
        ).value
        # The pad row must follow the table's compute dtype: a hardcoded f32
        # row would promote the concatenated table — and, transitively, the
        # whole text branch and everything attention later fuses it with —
        # back to f32 under a bfloat16 compute policy (measured: 88 of the
        # eval program's 126 matmuls silently ran f32 because of this line).
        pad = jnp.zeros((1, self.word_dim), dtype=glove.dtype)
        table = jnp.concatenate([pad, unk.astype(glove.dtype), glove], axis=0)
        emb = embedding_lookup(table, word_ids)
        return Dropout(self.droprate)(emb, deterministic=deterministic)


def _char_conv_impl() -> str:
    """Formulation knob for CharacterEmbedding's four merged convs:
    ``auto`` (default) = "windows" in deterministic mode, "conv" in train —
    each measured fastest for its direction (see the comment at the use
    site); ``windows``/``conv`` force one for A/B harnesses."""
    import os

    return os.environ.get("VMR_CHAR_CONV", "auto")


class _ConvKParams(nn.Module):
    """Registers a width-k nn.Conv's (kernel, bias) pair — identical names,
    shapes and initializers, so checkpoints are interchangeable with the
    plain conv stack — without invoking the conv op."""

    k: int
    in_dim: int
    ch: int

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", torch_linear_init_conv(self.in_dim * self.k),
                            (self.k, self.in_dim, self.ch))
        bias = self.param("bias", torch_bias_init_for(self.in_dim * self.k), (self.ch,))
        return kernel, bias


class CharacterEmbedding(nn.Module):
    """Char embedding + 4 parallel width-{1,2,3,4} convs + max-over-chars
    (models/layers.py:51-75).  Output dim = 10+20+30+40 = 100.

    The (1, k) Conv2d stack in the reference is a 1D conv over the char axis
    per word; we run it as one batched conv over (B*W, C, char_dim).
    """

    num_chars: int
    char_dim: int
    droprate: float = 0.0
    kernels: Sequence[int] = (1, 2, 3, 4)
    channels: Sequence[int] = (10, 20, 30, 40)

    @nn.compact
    def __call__(self, char_ids, deterministic: bool = True):
        B, W, C = char_ids.shape
        table = self.param(
            "char_table",
            nn.initializers.normal(stddev=1.0),  # torch nn.Embedding default N(0,1)
            (self.num_chars, self.char_dim),
        )
        # reshape ids BEFORE the lookup: the gather then writes the flat
        # (B·W, C, char_dim) layout its consumers read, instead of a 4D
        # layout XLA repairs with two ~25 us copies (docs/TRACE_EVAL_B128)
        flat_ids = char_ids.reshape(B * W, C)
        emb = embedding_lookup(table, flat_ids)  # (B*W, C, char_dim)
        # padding_idx=0 semantics: zero out PAD rows (grad-free by masking)
        emb = emb * (flat_ids != 0).astype(emb.dtype)[..., None]
        emb = Dropout(self.droprate)(emb, deterministic=deterministic)

        # All four width-k convs as ONE windows matmul.  Device traces
        # (docs/TRACE_EVAL_B128.json) showed the separate conv lowerings plus
        # the layout copies XLA inserts around them costing ~80 us of the
        # 945 us eval step at the headline config.  A width-k VALID conv is
        # a dot of the k-shifted stack: windows[t] = [x(t)..x(t+K-1)]
        # (K = max width), and kernel k occupies the first k·char_dim rows
        # of its column block with zeros below — so one (C, K·char_dim) @
        # (K·char_dim, Σch) matmul computes every conv at every position.
        # Positions t > C-k read zero-padding with zero weights (exact);
        # they are excluded from the max by a static mask, matching each
        # conv's own VALID range.  Params are the same conv_k{k} tree.
        K = max(self.kernels)
        kbs = []
        for k, ch in zip(self.kernels, self.channels):
            kernel = _ConvKParams(k, self.char_dim, ch, name=f"conv_k{k}")()
            kbs.append(kernel)
        b_all = jnp.concatenate([b for _, b in kbs], axis=0)
        emb_p = jnp.pad(emb, ((0, 0), (0, K - 1), (0, 0)))

        # Two exact formulations of the same (s, d) contraction, picked per
        # mode because their BACKWARDS differ by 4x in bytes:
        # - "windows": stack the K shifted views and run one (C, K*D) @
        #   (K*D, sum_ch) matmul.  Fastest FORWARD (round-3 trace: the
        #   separate conv lowerings + their layout copies cost ~80 us of the
        #   945 us eval step), but its backward materializes d(windows) —
        #   a K x duplicated (B*W, C, K*D) tensor whose split-and-add vjp
        #   alone measured 151 us/step (docs/TRACE_SEQPAN_TRAIN.json
        #   fusion.6013, 1.3 TB/s — bandwidth-bound on pure duplication).
        # - "conv": ONE width-K conv whose merged kernel zero-masks the taps
        #   s >= k of each width-k block.  The conv vjp is a transposed conv
        #   straight into d(emb) — no duplicated intermediate.
        impl = _char_conv_impl()
        if impl == "auto":
            impl = "windows" if deterministic else "conv"
        if impl == "conv":
            W_conv = jnp.concatenate(
                [jnp.concatenate(
                    [kern, jnp.zeros((K - k, self.char_dim, kern.shape[-1]), kern.dtype)],
                    axis=0)
                 for (kern, _), k in zip(kbs, self.kernels)], axis=2)  # (K, D, sum_ch)
            z = biased(jax.lax.conv_general_dilated(
                emb_p, W_conv.astype(emb.dtype), window_strides=(1,),
                padding="VALID", dimension_numbers=("NWC", "WIO", "NWC"),
            ), b_all)
        else:
            W_all = jnp.concatenate(
                [jnp.concatenate(
                    [kern, jnp.zeros((K - k, self.char_dim, kern.shape[-1]), kern.dtype)],
                    axis=0).reshape(K * self.char_dim, -1)
                 for (kern, _), k in zip(kbs, self.kernels)], axis=1)
            windows = jnp.concatenate([emb_p[:, s : s + C] for s in range(K)], axis=-1)
            z = biased(jnp.einsum("btd,dc->btc", windows, W_all.astype(emb.dtype)), b_all)

        # static per-channel validity: conv k's max runs over t <= C-k
        valid = np.zeros((C, sum(self.channels)), dtype=bool)
        off = 0
        for k, ch in zip(self.kernels, self.channels):
            valid[: C - k + 1, off : off + ch] = True
            off += ch
        m = jnp.max(jnp.where(jnp.asarray(valid), z, -1e30), axis=1)
        out = jax.nn.relu(m)  # relu(max) == max(relu) over the valid range
        return out.reshape(B, W, sum(self.channels))


def torch_linear_init_conv(fan_in: int) -> Callable:
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return init


class Embedding(nn.Module):
    """word ‖ char -> Conv1D -> LayerNorm (models/layers.py:78-93)."""

    out_dim: int
    word_dim: int
    char_dim: int
    num_chars: int
    word_vectors: Any
    droprate: float = 0.0

    @nn.compact
    def __call__(self, word_ids, char_ids, deterministic: bool = True):
        word_emb = WordEmbedding(self.word_dim, self.word_vectors, self.droprate, name="word_emb")(
            word_ids, deterministic
        )
        char_emb = CharacterEmbedding(self.num_chars, self.char_dim, self.droprate, name="char_emb")(
            char_ids, deterministic
        )
        emb = jnp.concatenate([word_emb, char_emb], axis=2)
        emb = Conv1D(self.out_dim, name="query_conv1d")(emb)
        return LayerNorm(name="q_layer_norm")(emb)


class PositionalEmbedding(nn.Module):
    """Learned absolute positions (models/layers.py:96-107)."""

    num_embeddings: int

    @nn.compact
    def __call__(self, x):
        L, D = x.shape[1], x.shape[2]
        table = self.param(
            "position_embeddings", nn.initializers.normal(stddev=1.0), (self.num_embeddings, D)
        )
        return jnp.broadcast_to(table[None, :L, :], (x.shape[0], L, D))


class VisualProjection(nn.Module):
    """dropout -> Conv1D -> LayerNorm (models/layers.py:110-123)."""

    dim: int
    droprate: float = 0.0

    @nn.compact
    def __call__(self, visual_features, deterministic: bool = True):
        x = Dropout(self.droprate)(visual_features, deterministic=deterministic)
        x = Conv1D(self.dim, name="video_conv1d")(x)
        return LayerNorm(name="v_layer_norm")(x)


_DEFAULT_DEPTHWISE_IMPL = "conv"
_DW_TRACED_WITH: Optional[str] = None


def set_default_depthwise_impl(impl: str) -> None:
    """Process-wide depthwise-conv formulation default (read at TRACE time,
    same contract as layers/dropout.py::set_default_dropout_bits —
    ``VMR_DEPTHWISE_IMPL`` wins; changing it after a trace warns loudly).

    "conv": XLA's grouped-conv lowering.  "shift": k shifted multiply-adds
    (see DepthwiseConv1D).  "shift_train": shift in training, conv in
    deterministic mode — for a mode-split default if the A/B splits."""
    global _DEFAULT_DEPTHWISE_IMPL
    impl = str(impl)
    if _DW_TRACED_WITH is not None and impl != _DEFAULT_DEPTHWISE_IMPL:
        import logging

        logging.getLogger(__name__).warning(
            "set_default_depthwise_impl(%s) called after a DepthwiseConv1D "
            "traced with %s — already-compiled functions keep the old "
            "formulation.", impl, _DW_TRACED_WITH)
    _DEFAULT_DEPTHWISE_IMPL = impl


def depthwise_impl(deterministic: bool) -> str:
    import os

    mode = os.environ.get("VMR_DEPTHWISE_IMPL", _DEFAULT_DEPTHWISE_IMPL)
    if mode == "shift_train":
        return "conv" if deterministic else "shift"
    return mode


class DepthwiseConv1D(nn.Module):
    """Depthwise k-tap conv over (B, L, D) — param-compatible with
    nn.Conv(feature_group_count=D): kernel (k, 1, D), no bias, SAME padding.

    impl "conv" is the grouped-conv lowering.  impl "shift" computes the
    same contraction as k shifted multiply-adds on a zero-padded tensor —
    XLA fuses the taps into one elementwise pass, and the backward becomes
    k shifted adds (data grad) + k (B,L)-reductions (weight grad) instead
    of the grouped-conv grad fusions the round-5 SeqPAN train trace
    measured at ~61 us each / 103 GB/s (docs/TRACE_SEQPAN_TRAIN.json
    fusion.5971 et al).  Same multiplies, same 7-term add order ->
    numerically equal to the conv lowering within f32 reassociation
    (tests/test_layers.py pins them to 1e-6)."""

    dim: int
    kernel_size: int = 7
    impl: str = "conv"

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        kernel = self.param("kernel", torch_linear_init_conv(k), (k, 1, self.dim))
        global _DW_TRACED_WITH
        if _DW_TRACED_WITH is None:
            _DW_TRACED_WITH = self.impl
        if self.impl == "conv":
            return jax.lax.conv_general_dilated(
                x, kernel.astype(x.dtype), window_strides=(1,), padding="SAME",
                dimension_numbers=("NWC", "WIO", "NWC"),
                feature_group_count=self.dim)
        L = x.shape[1]
        pad_lo = (k - 1) // 2
        xp = jnp.pad(x, ((0, 0), (pad_lo, k - 1 - pad_lo), (0, 0)))
        w = kernel[:, 0, :].astype(x.dtype)  # (k, D)
        out = xp[:, 0:L, :] * w[0]
        for i in range(1, k):
            out = out + xp[:, i:i + L, :] * w[i]
        return out


class DepthwiseSeparableConvBlock(nn.Module):
    """N × (LN -> depthwise k=7 -> pointwise -> ReLU -> dropout -> residual)
    (models/layers.py:126-148)."""

    dim: int
    kernel_size: int = 7
    num_layers: int = 4
    droprate: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        output = x
        impl = depthwise_impl(deterministic)
        for idx in range(self.num_layers):
            residual = output
            output = LayerNorm(name=f"layer_norm_{idx}")(output)
            # depthwise conv: groups == dim, no bias (torch fan_in = k * 1)
            output = DepthwiseConv1D(self.dim, self.kernel_size, impl=impl,
                                     name=f"depthwise_{idx}")(output)
            output = Conv1D(self.dim, name=f"pointwise_{idx}")(output)
            output = jax.nn.relu(output)
            output = Dropout(self.droprate)(output, deterministic=deterministic)
            output = output + residual
        return output


class FeatureEncoder(nn.Module):
    """pos-emb + conv block (models/layers.py:388-399)."""

    dim: int
    max_pos_len: int
    kernel_size: int = 7
    num_layers: int = 4
    droprate: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        features = x + PositionalEmbedding(self.max_pos_len, name="pos_embedding")(x)
        return DepthwiseSeparableConvBlock(
            self.dim, self.kernel_size, self.num_layers, self.droprate, name="conv_block"
        )(features, deterministic)
