"""On-device input pipeline: augmentation + resampling + label generation
as jitted XLA ops (the BASELINE.json north star — the reference does all of
this per-sample in Python on the host, utils/BaseDataset.py:26-68).

The host only pads raw features to a static ``max_raw_len`` and ships
(raw_vfeats, raw_lens, se_fracs, seed); everything else happens inside the
train/eval step:

- ``erosion`` augmentation: bounded rejection sampling of crop boundaries
  that keep the gt span inside (reference semantics,
  utils/data_utils.py:128-138, incl. the 100-draw cap of our host port);
- mean-pool resampling onto the fixed ``vlen`` grid, expressed as one
  per-sample segment-mean weight matrix einsummed with the raw features —
  a single MXU matmul instead of a host loop;
- boundary span extraction, clipped-Gaussian ``label1d`` heatmaps and the
  O/B/I/E ``NER_labels``, all from iota arithmetic.

- ``dilation`` augmentation: the reference prepends/appends random windows
  of the clip's NEGATIVE (outside-gt) frames (utils/data_utils.py:88-120) —
  here expressed as a pure index remapping into the raw buffer on a wider
  static grid of ``max_raw * (1 + 2p)`` frames, composed with the same
  resampling matmul.  When a clip has no negative frames the reference
  substitutes uniform noise (``torch.rand_like``); same here via jax PRNG.
  One intentional simplification: the reference tiles the negative pool by
  doubling and draws a start offset within the tiled buffer; since the tiled
  pool is periodic, we draw the offset directly in [0, n_neg) — the sampled
  windows are the same set, with a slightly different offset distribution.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp


def _round_half_even(x):
    return jnp.round(x)  # jnp.round == banker's rounding == python round()


def _sample_erosion_bounds(key, p: float, T, sidx, eidx):
    """Rejection-sample (head, tail) with head<=sidx, tail>=eidx (both on the
    raw grid); first accepted of 100 draws, clamped fallback."""
    k1, k2 = jax.random.split(key)
    u1 = jax.random.uniform(k1, (100,))
    u2 = jax.random.uniform(k2, (100,))
    head_cand = _round_half_even(u1 * p * T).astype(jnp.int32)
    tail_cand = (T - 1 - _round_half_even(u2 * p * T)).astype(jnp.int32)
    head_ok = head_cand <= sidx
    tail_ok = tail_cand >= eidx
    # first accepted draw; fallback to the always-valid clamp
    head = jnp.where(jnp.any(head_ok), head_cand[jnp.argmax(head_ok)], 0)
    tail = jnp.where(jnp.any(tail_ok), tail_cand[jnp.argmax(tail_ok)], T - 1)
    return head, tail


def _segment_weights(head, cur_len, vlen: int, max_raw: int, resample):
    """(vlen, max_raw) segment-mean weight matrix over the cropped clip
    [head, head+cur_len): the reference's interpolate_avrage bounds
    (utils/data_utils.py:161-175) as iota arithmetic.

    resample: bool scalar — False gives the identity (copy) mapping."""
    i = jnp.arange(vlen)
    t = jnp.arange(max_raw)
    # resampling bounds on the cropped grid
    idxs = _round_half_even(i / vlen * (cur_len - 1)).astype(jnp.int32)
    ends = jnp.concatenate([idxs[1:], jnp.asarray([cur_len], jnp.int32)])
    counts = ends - idxs
    in_seg = (t[None, :] >= (head + idxs)[:, None]) & (t[None, :] < (head + ends)[:, None])
    w_mean = in_seg.astype(jnp.float32) / jnp.maximum(counts, 1)[:, None].astype(jnp.float32)
    # empty segments (s == e) copy the single frame at s
    single = (t[None, :] == (head + jnp.minimum(idxs, cur_len - 1))[:, None]).astype(jnp.float32)
    w_res = jnp.where((counts > 0)[:, None], w_mean, single)
    # identity: output i <- raw[head + i] for i < cur_len
    w_id = ((t[None, :] == (head + i)[:, None]) & (i[:, None] < cur_len)).astype(jnp.float32)
    return jnp.where(resample, w_res, w_id)


def _dist_idx(sidx, eidx, vlen: int):
    grid = jnp.arange(vlen, dtype=jnp.float32)
    length = (eidx - sidx + 1).astype(jnp.float32)

    def curve(center):
        p = jnp.exp(-0.5 * jnp.square((grid - center) / (0.1 * length)))
        q = jnp.where(p >= 0.8, 1.0, p)
        q = jnp.where(p < 0.1353, 0.0, q)
        need_fallback = jnp.sum(q > 0.4) == 0
        fallback = q.at[jnp.argmax(p)].set(1.0)
        return jnp.where(need_fallback, fallback, q)

    return jnp.stack([curve(sidx.astype(jnp.float32)), curve(eidx.astype(jnp.float32))])


def _ner_label(sidx, eidx, cur_len, vlen: int, ext_len: int = 1):
    st_l = jnp.maximum(0, sidx - ext_len)
    st_r = jnp.minimum(sidx + ext_len, cur_len - 1)
    et_l = jnp.maximum(0, eidx - ext_len)
    et_r = jnp.minimum(eidx + ext_len, cur_len - 1)
    st_r = jnp.where(st_r >= et_l, jnp.maximum(sidx, et_l - 1), st_r)
    t = jnp.arange(vlen)
    lab = jnp.zeros(vlen, jnp.int32)
    lab = jnp.where((t >= st_l) & (t <= st_r), 1, lab)
    lab = jnp.where((t > st_r) & (t < et_l), 2, lab)
    lab = jnp.where((t >= et_l) & (t <= et_r), 3, lab)
    return lab


def _dilate(key, raw, T, sidx0, eidx0, p: float, max_raw: int):
    """Index-remapped dilation (reference feature_dilation + its
    select_negtive_segment, utils/data_utils.py:88-120).  Returns the
    dilated features on a static ``max_raw + 2*ceil(p*max_raw)`` grid plus
    (new_len, shifted sidx/eidx)."""
    pad = int(-(-p * max_raw // 1))  # ceil(p * max_raw), static
    grid = max_raw + 2 * pad
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    Tf = T.astype(jnp.float32)
    head_len = _round_half_even(jax.random.uniform(k1) * p * Tf).astype(jnp.int32)
    tail_len = _round_half_even(jax.random.uniform(k2) * p * Tf).astype(jnp.int32)

    r = jnp.arange(max_raw)
    neg_mask = (r < T) & ((r < sidx0) | (r > eidx0))
    n_neg = jnp.sum(neg_mask)
    # negative frame indices, ascending, packed to the front (stable sort)
    neg_order = jnp.argsort(~neg_mask, stable=True)
    denom = jnp.maximum(n_neg, 1)
    r_h = jax.random.randint(k3, (), 0, denom)
    r_t = jax.random.randint(k4, (), 0, denom)

    t = jnp.arange(grid)
    in_head = t < head_len
    in_body = (t >= head_len) & (t < head_len + T)
    in_tail = (t >= head_len + T) & (t < head_len + T + tail_len)
    head_src = neg_order[(r_h + t) % denom]
    tail_src = neg_order[(r_t + (t - head_len - T)) % denom]
    src = jnp.where(in_body, t - head_len, jnp.where(in_head, head_src, tail_src))
    dfeat = raw[jnp.clip(src, 0, max_raw - 1)]
    dfeat = dfeat * (in_head | in_body | in_tail)[:, None].astype(raw.dtype)
    # no negative frames at all -> uniform noise, like torch.rand_like
    noise = jax.random.uniform(k5, dfeat.shape, dfeat.dtype)
    use_noise = (n_neg == 0) & (in_head | in_tail)[:, None]
    dfeat = jnp.where(use_noise, noise, dfeat)
    new_len = head_len + T + tail_len
    return dfeat, new_len, sidx0 + head_len, eidx0 + head_len


def _one_sample(raw, raw_len, se_frac, key, *, vlen: int, max_raw: int,
                aug_mode: str, erosion_p: float, sample_type: str,
                label_threshold: float):
    T = raw_len
    sidx0 = _round_half_even(se_frac[0] * (T - 1).astype(jnp.float32)).astype(jnp.int32)
    eidx0 = _round_half_even(se_frac[1] * (T - 1).astype(jnp.float32)).astype(jnp.int32)

    grid = max_raw
    if aug_mode == "erosion":
        head, tail = _sample_erosion_bounds(key, erosion_p, T, sidx0, eidx0)
        cur = tail - head + 1
    elif aug_mode == "dilation":
        k_dil, key = jax.random.split(key)
        raw, cur, sidx0, eidx0 = _dilate(k_dil, raw, T, sidx0, eidx0, erosion_p, max_raw)
        grid = raw.shape[0]
        head = jnp.int32(0)
    else:  # unchanged
        head, cur = jnp.int32(0), T

    if sample_type == "samelen":
        resample = jnp.bool_(True)
    elif sample_type == "truncation":
        resample = cur > vlen
    else:  # original
        resample = jnp.bool_(False)

    W = _segment_weights(head, cur, vlen, grid, resample)  # (vlen, grid)
    vfeat = jnp.einsum("vt,td->vd", W, raw)

    # raw-grid gt label resampled through the same weights
    t = jnp.arange(grid)
    raw_label = ((t >= sidx0) & (t <= eidx0)).astype(jnp.float32)
    label = W @ raw_label

    out_len = jnp.where(resample, vlen, jnp.minimum(cur, vlen))
    vmask = (jnp.arange(vlen) < out_len).astype(jnp.float32)

    hit = label >= label_threshold
    sidx = jnp.argmax(hit)
    eidx = vlen - 1 - jnp.argmax(hit[::-1])
    label1d = _dist_idx(sidx, eidx, vlen)
    ner = _ner_label(sidx, eidx, out_len, vlen)
    return vfeat, vmask, label1d, ner


@functools.partial(jax.jit, static_argnames=("vlen", "aug_mode", "erosion_p",
                                             "sample_type", "label_threshold"))
def device_augment_resample(raw_vfeats, raw_lens, se_fracs, seed, *, vlen: int,
                            aug_mode: str = "unchanged", erosion_p: float = 0.05,
                            sample_type: str = "truncation",
                            label_threshold: float = 0.01) -> Dict[str, jnp.ndarray]:
    """(B, max_raw, D) padded raw features -> static-shape training tensors."""
    B, max_raw, _ = raw_vfeats.shape
    keys = jax.random.split(jax.random.PRNGKey(seed), B)
    fn = functools.partial(_one_sample, vlen=vlen, max_raw=max_raw, aug_mode=aug_mode,
                           erosion_p=erosion_p, sample_type=sample_type,
                           label_threshold=label_threshold)
    vfeats, vmasks, label1ds, ners = jax.vmap(fn)(raw_vfeats, raw_lens, se_fracs, keys)
    return {"vfeats": vfeats, "vmasks": vmasks, "label1ds": label1ds, "NER_labels": ners}
