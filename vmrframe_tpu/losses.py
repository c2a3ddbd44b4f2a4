"""Loss functions (jax port of models/loss.py from the reference).

All losses take an optional per-sample weight vector (``sample_mask``) so the
padded tail of the final partial batch contributes nothing — the reference
never pads batches, so with full batches the weighted means are identical.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from vmrframe_tpu.ops.masking import mask_logits


def _weighted_mean(per_sample: jnp.ndarray, sample_mask: Optional[jnp.ndarray]) -> jnp.ndarray:
    if sample_mask is None:
        return jnp.mean(per_sample)
    return jnp.sum(per_sample * sample_mask) / jnp.maximum(jnp.sum(sample_mask), 1.0)


def lossfun_loc(
    start_logits: jnp.ndarray,
    end_logits: jnp.ndarray,
    s_labels: jnp.ndarray,
    e_labels: jnp.ndarray,
    vmask: jnp.ndarray,
    sample_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """CE against soft (unnormalized!) distributional labels.

    Matches torch nn.CrossEntropyLoss with probability targets
    (models/loss.py:43-54): loss_b = -Σ_l target[b,l]·log_softmax(logits)[b,l],
    averaged over the batch.  The reference does NOT mask the logits here —
    the soft labels are ~0 outside the valid range; we reproduce that.
    """
    del vmask
    s_ll = jax.nn.log_softmax(start_logits, axis=1)
    e_ll = jax.nn.log_softmax(end_logits, axis=1)
    sloss = -jnp.sum(s_labels * s_ll, axis=1)
    eloss = -jnp.sum(e_labels * e_ll, axis=1)
    return _weighted_mean(sloss, sample_mask) + _weighted_mean(eloss, sample_mask)


def lossfun_match(
    match_probs: jnp.ndarray,
    label_embs: jnp.ndarray,
    m_labels: jnp.ndarray,
    vmask: jnp.ndarray,
    sample_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """-Σ onehot(NER)·probs over valid frames + an orthogonality penalty on
    the 4 label embeddings (models/loss.py:24-41).

    NB the reference computes log(match_score) in the forward but its engines
    pass the RAW gumbel-softmax probabilities here (SeqPAN.py:89-95 returns
    'match_score'; train_engine_SeqPAN:178 feeds it straight in) — so the
    trained objective is -probability, not NLL.  Callers pass match_score to
    reproduce that.
    """
    m_onehot = jax.nn.one_hot(m_labels, 4, dtype=match_probs.dtype)
    loss_per_pos = -jnp.sum(m_onehot * match_probs, axis=-1)  # (B, L)
    weight = vmask
    if sample_mask is not None:
        weight = weight * sample_mask[:, None]
    m_loss = jnp.sum(loss_per_pos * weight) / (jnp.sum(weight) + 1e-12)
    gram = jnp.matmul(label_embs.T, label_embs) * (1.0 - jnp.eye(4, dtype=label_embs.dtype))
    ortho = jnp.linalg.norm(gram.reshape(-1), ord=2)
    return m_loss + ortho


def lossfun_loc2d(
    scores2d: jnp.ndarray,
    labels2d: jnp.ndarray,
    mask2d: jnp.ndarray,
    min_iou: float = 0.5,
    max_iou: float = 1.0,
    sample_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Scaled-IoU BCE over the masked 2D proposal map (models/loss.py:169-178)."""
    labels = jnp.clip((labels2d - min_iou) / (max_iou - min_iou), 0.0, 1.0)
    per_cell = labels * jax.nn.softplus(-scores2d) + (1 - labels) * jax.nn.softplus(scores2d)
    weight = jnp.broadcast_to(mask2d.astype(scores2d.dtype), per_cell.shape)
    if sample_mask is not None:
        weight = weight * sample_mask.reshape((-1,) + (1,) * (per_cell.ndim - 1))
    return jnp.sum(per_cell * weight) / jnp.maximum(jnp.sum(weight), 1.0)


def lossfun_softloc(
    slogits: jnp.ndarray,
    elogits: jnp.ndarray,
    s_labels: jnp.ndarray,
    e_labels: jnp.ndarray,
    vmask: jnp.ndarray,
    temperature: float,
) -> jnp.ndarray:
    """Distillation loss (models/loss.py:180-198): mask, L2-normalize over
    positions, temperature softmax, per-sample sum of KL(teacher ‖ student).
    Returns per-sample (B,) values (callers reduce, matching the reference)."""

    def _prep(x):
        x = mask_logits(x, vmask)
        norm = jnp.linalg.norm(x, axis=1, keepdims=True)
        x = x / jnp.maximum(norm, 1e-12)
        return jax.nn.softmax(x / temperature, axis=-1)

    sp, ep = _prep(slogits), _prep(elogits)
    st, et = _prep(s_labels), _prep(e_labels)
    # F.kl_div(input=log q, target p) = p * (log p - log q)
    sloss = jnp.sum(st * (jnp.log(jnp.maximum(st, 1e-30)) - jnp.log(jnp.maximum(sp, 1e-30))), axis=1)
    eloss = jnp.sum(et * (jnp.log(jnp.maximum(et, 1e-30)) - jnp.log(jnp.maximum(ep, 1e-30))), axis=1)
    return sloss + eloss


def cal_nll_loss(logit: jnp.ndarray, idx: jnp.ndarray, mask: jnp.ndarray, weights=None, eps: float = 0.1):
    """Label-smoothed NLL used by CPL (models/loss.py:115-130).

    logit: (N, L, V); idx: (N, L) targets; mask: (N, L).
    Returns (per-sequence loss (N,), mean accuracy scalar)."""
    acc = (jnp.argmax(logit, axis=-1) == idx).astype(jnp.float32)
    mean_acc = jnp.sum(acc * mask) / jnp.maximum(jnp.sum(mask), 1.0)
    logp = jax.nn.log_softmax(logit, axis=-1)
    # target-logit pick as a one-hot contraction: XLA lowers take_along_axis
    # to N·L scalar-indexed loads on TPU (measured 313 us of CPL's eval step
    # at B·P=1024 — docs/TRACE_CPL_EVAL.json); the one-hot einsum is a VPU
    # multiply-reduce that fuses with log_softmax (exact: one nonzero/row)
    oh = jax.nn.one_hot(idx, logit.shape[-1], dtype=logp.dtype)
    nll = -jnp.einsum("...v,...v->...", logp, oh)
    smooth = -jnp.sum(logp, axis=-1)
    nll = (1 - eps) * nll + eps / logit.shape[-1] * smooth
    if weights is None:
        nll = jnp.where(mask == 0, 0.0, nll)
        nll = jnp.sum(nll, axis=-1) / jnp.maximum(jnp.sum(mask, axis=-1), 1.0)
    else:
        nll = jnp.sum(nll * weights, axis=-1)
    return nll, mean_acc


def rec_loss_cpl(tlogit_prop: jnp.ndarray, words_id: jnp.ndarray, words_mask: jnp.ndarray, num_props: int):
    """Min-over-proposals reconstruction NLL (models/loss.py:133-153)."""
    P = num_props
    B = tlogit_prop.shape[0] // P
    mask1 = jnp.repeat(words_mask[:, None, :], P, axis=1).reshape(B * P, -1)
    ids1 = jnp.repeat(words_id[:, None, :], P, axis=1).reshape(B * P, -1)
    nll, _ = cal_nll_loss(tlogit_prop, ids1, mask1)
    min_nll = jnp.min(nll.reshape(B, P), axis=-1)
    return jnp.mean(min_nll)


def div_loss_cpl(gauss_weight: jnp.ndarray, num_props: int, lam: float, alpha: float):
    """Proposal-diversity penalty ‖λI − GGᵀ‖² (models/loss.py:156-166)."""
    P = num_props
    B = gauss_weight.shape[0] // P
    gw = gauss_weight.reshape(B, P, -1)
    gw = gw / jnp.sum(gw, axis=-1, keepdims=True)
    target = jnp.eye(P)[None] * lam
    source = jnp.matmul(gw, gw.transpose(0, 2, 1))
    div = jnp.sum(jnp.square(target - source), axis=(1, 2))
    return jnp.mean(div) * alpha
