"""ActionFormer layer library — TPU-native port of models/ActionFormerlib/
{blocks,backbones,necks,loc_generators}.py from the reference.

Layout note: the reference runs channel-first (B, C, T); everything here is
channel-LAST (B, T, C) so projections are plain MXU matmuls and XLA fuses the
masks into them.  Masks are (B, T) float {0,1}.

Local window attention: the reference implements Longformer-style sliding
windows with as_strided chunk tricks (blocks.py:309-641).  At short lengths
(T ≤ a few hundred) a full attention matrix with an additive band mask is
the same math, exactly, and maps straight onto the MXU — so that is what
``MaskedMHCA`` computes by default (``window_size > 0`` adds the band mask).
For the long-sequence regime the blocked Pallas kernel
(kernels/window_attention.py) computes only the band — O(T·w) instead of
O(T²) — and is auto-enabled when T ≥ ``pallas_min_len`` (threshold measured
on-chip, docs/BENCH_KERNELS.json) and the semantics match exactly (no
rel-PE, no attention dropout).
"""

from __future__ import annotations

import math
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from vmrframe_tpu.layers.dropout import Dropout

from vmrframe_tpu.layers.basic import torch_linear_init_conv


class ChannelLayerNorm(nn.Module):
    """LayerNorm over the channel axis, eps 1e-5 (reference blocks.py:63-105,
    which normalizes dim=1 of (B, C, T); ours is the last axis of (B, T, C))."""

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        weight = self.param("weight", nn.initializers.ones, (C,))
        bias = self.param("bias", nn.initializers.zeros, (C,))
        mu = jnp.mean(x, axis=-1, keepdims=True)
        res = x - mu
        sigma = jnp.mean(res * res, axis=-1, keepdims=True)
        out = (res * jax.lax.rsqrt(sigma + self.epsilon)) * weight + bias
        # vector-param policy: f32 weight/bias must not promote downstream
        return out.astype(x.dtype) if out.dtype != x.dtype else out


class MaskedConv1D(nn.Module):
    """Conv over (B, T, C) with mask maintenance (reference blocks.py:10-60):
    output masked, mask nearest-downsampled when strided.  Bias starts at 0."""

    features: int
    kernel_size: int
    stride: int = 1
    groups: int = 1
    use_bias: bool = True

    @nn.compact
    def __call__(self, x, mask):
        in_ch = x.shape[-1]
        fan_in = (in_ch // self.groups) * self.kernel_size
        # explicit symmetric k//2 padding: flax 'SAME' pads asymmetrically for
        # strided convs, which shifts the downsampled grid by one vs torch
        pad = self.kernel_size // 2
        y = nn.Conv(
            features=self.features,
            kernel_size=(self.kernel_size,),
            strides=(self.stride,),
            padding=((pad, pad),),
            feature_group_count=self.groups,
            use_bias=self.use_bias,
            kernel_init=torch_linear_init_conv(fan_in),
            bias_init=nn.initializers.zeros,
            # computation follows the activation dtype (vector-param policy)
            dtype=x.dtype,
            name="conv",
        )(x)
        if self.stride > 1:
            out_mask = mask[:, :: self.stride]
        else:
            out_mask = mask
        return y * out_mask[..., None], out_mask


def get_sinusoid_encoding(n_position: int, d_hid: int) -> np.ndarray:
    """(n_position, d_hid) sinusoid table (reference blocks.py:109-120)."""
    pos = np.arange(n_position)[:, None]
    idx = np.arange(d_hid)[None, :]
    angle = pos / np.power(10000, 2 * (idx // 2) / d_hid)
    table = np.zeros((n_position, d_hid), dtype=np.float32)
    table[:, 0::2] = np.sin(angle[:, 0::2])
    table[:, 1::2] = np.cos(angle[:, 1::2])
    return table


class MaskedMHCA(nn.Module):
    """Multi-head conv attention (reference blocks.py:192-306): depthwise
    strided convs + channel-LN on q/k/v, 1×1 projections, masked attention.
    ``window_size > 0`` adds a local band mask — the exact semantics of the
    reference's LocalMaskedMHCA without the chunking machinery."""

    n_embd: int
    n_head: int
    n_qx_stride: int = 1
    n_kv_stride: int = 1
    attn_pdrop: float = 0.0
    proj_pdrop: float = 0.0
    window_size: int = -1
    use_rel_pe: bool = False  # learned per-head relative PE inside the window
    # banded Pallas kernel auto-enable: used when window_size > 0, Tq >= this,
    # and the semantics are identical (no rel-PE, no live attention dropout).
    # -1 disables.  Default calibrated from docs/BENCH_KERNELS.json.
    # The gate is MODE-AWARE: ``pallas_min_len`` governs train-mode calls,
    # ``pallas_min_len_eval`` (None = same as train) governs deterministic
    # ones — round-4 re-measure at the shipped long config (T=2304, w=19;
    # docs/BENCH_AF_LONG.json) has Pallas WINNING train (13.83 vs 15.4
    # ms/step) but LOSING eval (4.21 vs 3.92): the isolated kernel is 5x
    # faster (BENCH_KERNELS banded_T2304) but in the eval step XLA fuses
    # the band-mask path into the surrounding program better than it
    # schedules the custom-call.  models/actionformer.py wires eval to -1.
    pallas_min_len: int = 512
    pallas_min_len_eval: Optional[int] = None
    pallas_interpret: bool = False  # CPU testing escape hatch

    def _use_banded_kernel(self, Tq: int, Tk: int, deterministic: bool) -> bool:
        min_len = self.pallas_min_len
        if deterministic and self.pallas_min_len_eval is not None:
            min_len = self.pallas_min_len_eval
        if self.window_size <= 0 or self.use_rel_pe or min_len < 0:
            return False
        if not (deterministic or self.attn_pdrop == 0.0):
            return False
        if Tq != Tk or Tq < min_len:
            return False
        # the kernel needs one full key window to fit the padded length
        half = self.window_size // 2
        k_win = 128 + 2 * ((half + 127) // 128) * 128
        t_pad = ((Tq + 127) // 128) * 128
        if t_pad < k_win:
            return False
        if self.pallas_interpret:
            return True
        from vmrframe_tpu.kernels.attention import pallas_supported

        return pallas_supported()

    @nn.compact
    def __call__(self, x, mask, deterministic: bool = True):
        B, T, C = x.shape
        n_ch = self.n_embd // self.n_head
        scale = 1.0 / math.sqrt(n_ch)

        q_ks = self.n_qx_stride + 1 if self.n_qx_stride > 1 else 3
        kv_ks = self.n_kv_stride + 1 if self.n_kv_stride > 1 else 3
        # NB the reference strides the query conv by n_kv_stride too
        # (blocks.py:228-233) — strides are always equal in practice
        q, qx_mask = MaskedConv1D(self.n_embd, q_ks, self.n_kv_stride,
                                  groups=self.n_embd, use_bias=False, name="query_conv")(x, mask)
        q = ChannelLayerNorm(name="query_norm")(q)
        k, kv_mask = MaskedConv1D(self.n_embd, kv_ks, self.n_kv_stride,
                                  groups=self.n_embd, use_bias=False, name="key_conv")(x, mask)
        k = ChannelLayerNorm(name="key_norm")(k)
        v, _ = MaskedConv1D(self.n_embd, kv_ks, self.n_kv_stride,
                            groups=self.n_embd, use_bias=False, name="value_conv")(x, mask)
        v = ChannelLayerNorm(name="value_norm")(v)

        def proj(name):
            return nn.Dense(self.n_embd, kernel_init=torch_linear_init_conv(self.n_embd),
                            bias_init=nn.initializers.zeros, dtype=x.dtype, name=name)

        q = proj("query")(q)
        k = proj("key")(k)
        v = proj("value")(v)

        Tq, Tk = q.shape[1], k.shape[1]
        qh = q.reshape(B, Tq, self.n_head, n_ch).transpose(0, 2, 1, 3)
        kh = k.reshape(B, Tk, self.n_head, n_ch).transpose(0, 2, 1, 3)
        vh = v.reshape(B, Tk, self.n_head, n_ch).transpose(0, 2, 1, 3)

        if self._use_banded_kernel(Tq, Tk, deterministic):
            from vmrframe_tpu.kernels.window_attention import banded_attention

            out_h = banded_attention(qh, kh, vh, kv_mask, self.window_size,
                                     interpret=self.pallas_interpret)
            out = out_h.transpose(0, 2, 1, 3).reshape(B, Tq, self.n_embd)
            out = proj("proj")(out)
            out = Dropout(self.proj_pdrop)(out, deterministic=deterministic)
            return out * qx_mask[..., None], qx_mask

        att = jnp.einsum("bhqd,bhkd->bhqk", qh * scale, kh)
        neg = jnp.finfo(att.dtype).min
        att = jnp.where(kv_mask[:, None, None, :] > 0, att, neg)
        if self.window_size > 0:
            qi = jnp.arange(Tq)[:, None]
            kj = jnp.arange(Tk)[None, :]
            half = self.window_size // 2
            band = jnp.abs(qi - kj) <= half
            if self.use_rel_pe:
                # (1, 1, n_head, window_size) learned offsets added to the
                # in-window scores (reference blocks.py:392-396,609-610)
                rel_pe = self.param(
                    "rel_pe",
                    nn.initializers.truncated_normal(stddev=(2.0 / self.n_embd) ** 0.5),
                    (self.n_head, self.window_size),
                )
                offset = jnp.clip(kj - qi + half, 0, self.window_size - 1)
                att = att + jnp.where(band[None, None],
                                      rel_pe[None, :, offset], 0.0)
            att = jnp.where(band[None, None], att, neg)
        att = jax.nn.softmax(att, axis=-1)
        att = Dropout(self.attn_pdrop)(att, deterministic=deterministic)
        out = jnp.einsum("bhqk,bhkd->bhqd", att, vh * kv_mask[:, None, :, None])
        out = out.transpose(0, 2, 1, 3).reshape(B, Tq, self.n_embd)
        out = proj("proj")(out)
        out = Dropout(self.proj_pdrop)(out, deterministic=deterministic)
        return out * qx_mask[..., None], qx_mask


def drop_path(rng, x, drop_prob: float, deterministic: bool):
    """Stochastic depth per sample (reference blocks.py:814-828)."""
    if deterministic or drop_prob == 0.0:
        return x
    keep_prob = 1.0 - drop_prob
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    keep = jnp.floor(keep_prob + jax.random.uniform(rng, shape, x.dtype))
    return x / keep_prob * keep


class AffineDropPath(nn.Module):
    """Per-channel scale (init 1e-4) + stochastic depth (blocks.py:840-854)."""

    num_dim: int
    drop_prob: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        scale = self.param("scale", nn.initializers.constant(1e-4), (1, 1, self.num_dim))
        y = scale * x
        if not deterministic and self.drop_prob > 0.0:
            y = drop_path(self.make_rng("dropout"), y, self.drop_prob, deterministic)
        return y


def _maxpool1d(x, kernel_size: int, stride: int, padding: int):
    """torch nn.MaxPool1d over (B, T, C)."""
    return jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, kernel_size, 1),
        window_strides=(1, stride, 1),
        padding=((0, 0), (padding, padding), (0, 0)),
    )


class TransformerBlock(nn.Module):
    """Pre-LN transformer block with optional stride-2 downsampling and a
    max-pooled skip path (reference blocks.py:644-732)."""

    n_embd: int
    n_head: int
    n_ds_stride: int = 1
    attn_pdrop: float = 0.0
    proj_pdrop: float = 0.0
    path_pdrop: float = 0.0
    mha_win_size: int = -1
    use_rel_pe: bool = False
    pallas_min_len: int = 512
    pallas_min_len_eval: Optional[int] = None

    @nn.compact
    def __call__(self, x, mask, deterministic: bool = True):
        out, out_mask = MaskedMHCA(
            self.n_embd, self.n_head,
            n_qx_stride=self.n_ds_stride, n_kv_stride=self.n_ds_stride,
            attn_pdrop=self.attn_pdrop, proj_pdrop=self.proj_pdrop,
            window_size=self.mha_win_size, use_rel_pe=self.use_rel_pe,
            pallas_min_len=self.pallas_min_len,
            pallas_min_len_eval=self.pallas_min_len_eval, name="attn",
        )(ChannelLayerNorm(name="ln1")(x), mask, deterministic)

        if self.n_ds_stride > 1:
            ks, stride, pad = self.n_ds_stride + 1, self.n_ds_stride, (self.n_ds_stride + 1) // 2
            skip = _maxpool1d(x, ks, stride, pad)
        else:
            skip = x
        mf = out_mask[..., None]
        if self.path_pdrop > 0.0:
            out = skip * mf + AffineDropPath(self.n_embd, self.path_pdrop, name="drop_path_attn")(
                out, deterministic)
        else:
            out = skip * mf + out

        h = ChannelLayerNorm(name="ln2")(out)
        h = nn.Dense(4 * self.n_embd, kernel_init=torch_linear_init_conv(self.n_embd),
                     bias_init=nn.initializers.zeros, dtype=h.dtype, name="mlp_fc1")(h)
        h = jax.nn.gelu(h, approximate=False)
        h = Dropout(self.proj_pdrop)(h, deterministic=deterministic)
        h = nn.Dense(self.n_embd, kernel_init=torch_linear_init_conv(4 * self.n_embd),
                     bias_init=nn.initializers.zeros, dtype=h.dtype, name="mlp_fc2")(h)
        h = Dropout(self.proj_pdrop)(h, deterministic=deterministic)
        h = h * mf
        if self.path_pdrop > 0.0:
            out = out + AffineDropPath(self.n_embd, self.path_pdrop, name="drop_path_mlp")(
                h, deterministic)
        else:
            out = out + h
        return out, out_mask


class ConvTransformerBackbone(nn.Module):
    """Conv embedding + stem transformers + stride-2 branch producing the
    multiscale pyramid (reference backbones.py:11-163).  Returns per-level
    (feats, masks) tuples, channel-last."""

    n_in: int
    n_embd: int
    n_head: int
    n_embd_ks: int
    max_len: int
    arch: Tuple[int, int, int] = (2, 2, 5)
    mha_win_size: Sequence[int] = (-1,) * 6
    scale_factor: int = 2
    with_ln: bool = True
    attn_pdrop: float = 0.0
    proj_pdrop: float = 0.0
    path_pdrop: float = 0.0
    use_abs_pe: bool = False
    use_rel_pe: bool = False
    pallas_min_len: int = 512
    pallas_min_len_eval: Optional[int] = None

    @nn.compact
    def __call__(self, x, mask, deterministic: bool = True):
        # embedding convs
        for idx in range(self.arch[0]):
            x, mask = MaskedConv1D(
                self.n_embd, self.n_embd_ks, 1, use_bias=(not self.with_ln),
                name=f"embd_{idx}",
            )(x, mask)
            if self.with_ln:
                x = ChannelLayerNorm(name=f"embd_norm_{idx}")(x)
            x = jax.nn.relu(x)

        if self.use_abs_pe:
            T = x.shape[1]
            pe = jnp.asarray(get_sinusoid_encoding(self.max_len, self.n_embd)) / (self.n_embd**0.5)
            x = x + pe[None, :T, :] * mask[..., None]

        for idx in range(self.arch[1]):
            x, mask = TransformerBlock(
                self.n_embd, self.n_head, n_ds_stride=1,
                attn_pdrop=self.attn_pdrop, proj_pdrop=self.proj_pdrop,
                path_pdrop=self.path_pdrop, mha_win_size=self.mha_win_size[0],
                use_rel_pe=self.use_rel_pe, pallas_min_len=self.pallas_min_len,
                pallas_min_len_eval=self.pallas_min_len_eval,
                name=f"stem_{idx}",
            )(x, mask, deterministic)

        out_feats, out_masks = [x], [mask]
        for idx in range(self.arch[2]):
            x, mask = TransformerBlock(
                self.n_embd, self.n_head, n_ds_stride=self.scale_factor,
                attn_pdrop=self.attn_pdrop, proj_pdrop=self.proj_pdrop,
                path_pdrop=self.path_pdrop, mha_win_size=self.mha_win_size[1 + idx],
                use_rel_pe=self.use_rel_pe, pallas_min_len=self.pallas_min_len,
                pallas_min_len_eval=self.pallas_min_len_eval,
                name=f"branch_{idx}",
            )(x, mask, deterministic)
            out_feats.append(x)
            out_masks.append(mask)
        return out_feats, out_masks


class ConvBlock(nn.Module):
    """ResNet-style basic block with optional stride (reference
    blocks.py:735-785): strided conv -> conv, 1×1 strided downsample skip."""

    n_embd: int
    kernel_size: int = 3
    n_ds_stride: int = 1
    expansion_factor: int = 2

    @nn.compact
    def __call__(self, x, mask):
        width = self.n_embd * self.expansion_factor
        out, out_mask = MaskedConv1D(width, self.kernel_size, self.n_ds_stride,
                                     name="conv1")(x, mask)
        out = jax.nn.relu(out)
        out, out_mask = MaskedConv1D(self.n_embd, self.kernel_size, 1, name="conv2")(out, out_mask)
        if self.n_ds_stride > 1:
            identity, _ = MaskedConv1D(self.n_embd, 1, self.n_ds_stride, name="downsample")(x, mask)
        else:
            identity = x
        return jax.nn.relu(out + identity), out_mask


class ConvBackbone(nn.Module):
    """Conv-only pyramid backbone (reference backbones.py:166-265): embedding
    convs -> stem ConvBlocks -> stride-2 branch ConvBlocks."""

    n_in: int
    n_embd: int
    n_embd_ks: int
    arch: Tuple[int, int, int] = (2, 2, 5)
    scale_factor: int = 2
    with_ln: bool = True

    @nn.compact
    def __call__(self, x, mask, deterministic: bool = True):
        for idx in range(self.arch[0]):
            x, mask = MaskedConv1D(self.n_embd, self.n_embd_ks, 1,
                                   use_bias=(not self.with_ln), name=f"embd_{idx}")(x, mask)
            if self.with_ln:
                x = ChannelLayerNorm(name=f"embd_norm_{idx}")(x)
            x = jax.nn.relu(x)
        for idx in range(self.arch[1]):
            x, mask = ConvBlock(self.n_embd, 3, 1, name=f"stem_{idx}")(x, mask)
        out_feats, out_masks = [x], [mask]
        for idx in range(self.arch[2]):
            x, mask = ConvBlock(self.n_embd, 3, self.scale_factor, name=f"branch_{idx}")(x, mask)
            out_feats.append(x)
            out_masks.append(mask)
        return out_feats, out_masks


class FPN1D(nn.Module):
    """Feature pyramid neck (reference necks.py:8-91): lateral 1×1 convs,
    top-down nearest-neighbor upsampling, depthwise 3-convs + channel-LN."""

    num_levels: int
    out_channel: int
    scale_factor: int = 2
    with_ln: bool = True

    @nn.compact
    def __call__(self, feats: List[jnp.ndarray], masks: List[jnp.ndarray]):
        laterals = []
        for i in range(self.num_levels):
            x, _ = MaskedConv1D(self.out_channel, 1, 1, use_bias=(not self.with_ln),
                                name=f"lateral_{i}")(feats[i], masks[i])
            laterals.append(x)
        # top-down pathway: nearest upsample by scale_factor
        for i in range(self.num_levels - 1, 0, -1):
            up = jnp.repeat(laterals[i], self.scale_factor, axis=1)
            laterals[i - 1] = laterals[i - 1] + up[:, : laterals[i - 1].shape[1]]
        out_feats, out_masks = [], []
        for i in range(self.num_levels):
            x, m = MaskedConv1D(self.out_channel, 3, 1, groups=self.out_channel,
                                use_bias=(not self.with_ln), name=f"fpn_conv_{i}")(
                laterals[i], masks[i])
            if self.with_ln:
                x = ChannelLayerNorm(name=f"fpn_norm_{i}")(x)
            out_feats.append(x)
            out_masks.append(m)
        return out_feats, out_masks


class FPNIdentity(nn.Module):
    """Per-level channel-LN (reference necks.py:94-143)."""

    num_levels: int
    with_ln: bool = True

    @nn.compact
    def __call__(self, feats: List[jnp.ndarray], masks: List[jnp.ndarray]):
        out = []
        for i, f in enumerate(feats):
            out.append(ChannelLayerNorm(name=f"fpn_norm_{i}")(f) if self.with_ln else f)
        return out, masks


def generate_points(max_seq_len: int, fpn_strides: Sequence[int],
                    regression_range: Sequence[Sequence[float]]) -> List[np.ndarray]:
    """Fixed per-level point buffers (t, reg_min, reg_max, stride) —
    reference loc_generators.py:27-84, precomputed as numpy."""
    out = []
    for stride, rng_l in zip(fpn_strides, regression_range):
        ts = np.arange(0, max_seq_len, stride, dtype=np.float32)
        pts = np.stack(
            [ts,
             np.full_like(ts, rng_l[0]),
             np.full_like(ts, rng_l[1]),
             np.full_like(ts, float(stride))], axis=1)
        out.append(pts)
    return out


class ConvHead(nn.Module):
    """Shared per-level conv tower -> per-point outputs (reference
    meta_archs.py:16-162).  ``out_dim`` = num_classes (cls) or 2 (reg)."""

    feat_dim: int
    out_dim: int
    num_layers: int = 3
    kernel_size: int = 3
    with_ln: bool = True
    final_bias_init: float = 0.0

    @nn.compact
    def __call__(self, fpn_feats, fpn_masks, deterministic: bool = True):
        convs = [
            MaskedConv1D(self.feat_dim, self.kernel_size, 1, use_bias=(not self.with_ln),
                         name=f"head_{i}")
            for i in range(self.num_layers - 1)
        ]
        norms = [ChannelLayerNorm(name=f"norm_{i}") for i in range(self.num_layers - 1)]
        final = MaskedConv1D(self.out_dim, self.kernel_size, 1, name="final")
        # override final bias init (cls prior prob)
        outs = []
        for feat, m in zip(fpn_feats, fpn_masks):
            cur = feat
            for conv, norm in zip(convs, norms):
                cur, _ = conv(cur, m)
                cur = jax.nn.relu(norm(cur) if self.with_ln else cur)
            cur, _ = final(cur, m)
            if self.final_bias_init != 0.0:
                cur = cur + self.final_bias_init
            outs.append(cur)
        return outs


class Scale(nn.Module):
    """Learnable scalar multiplier (reference blocks.py:789-806)."""

    init_value: float = 1.0

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.constant(self.init_value), ())
        return x * scale
