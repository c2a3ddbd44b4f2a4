"""Reference-API compatibility façade.

Users of the PyTorch reference find the names they know (utils/engine.py,
models/loss.py, utils/utils.py) mapped onto this framework's primitives.
These are thin aliases — new code should import from the real modules.
"""

from __future__ import annotations

import numpy as np

from vmrframe_tpu.losses import (  # noqa: F401
    cal_nll_loss,
    div_loss_cpl,
    lossfun_loc,
    lossfun_loc2d,
    lossfun_match,
    lossfun_softloc,
    rec_loss_cpl,
)
from vmrframe_tpu.metrics import (  # noqa: F401
    AverageMeter,
    append_ious,
    calculate_iou,
    calculate_iou_accuracy,
    frac_idx,
    get_i345_mi,
    idx_time,
    time_idx,
)
from vmrframe_tpu.data.datasets import load_json, load_pickle, save_pickle  # noqa: F401
from vmrframe_tpu.data.labels import (  # noqa: F401
    gaussian_weight as get_gaussian_weight,
    mask2d as generate_2dmask,
    soft_label as gene_soft_label,
)
from vmrframe_tpu.ops.masking import length_to_mask as convert_length_to_mask  # noqa: F401
from vmrframe_tpu.ops.masking import mask_logits  # noqa: F401
from vmrframe_tpu.ops.span import infer_span_1d as infer_basic  # noqa: F401
from vmrframe_tpu.ops.span import infer_span_2d as infer_basic2d  # noqa: F401


def build_train_engine(model_name: str):
    """The reference's ``train_engine_<Name>``/``infer_<Name>`` pair as
    closures over the registry entry: ``engine(trainer_state, batch, cfg)``
    is replaced by the Trainer's fused step — this helper exists for scripts
    that only need loss/infer functions by model name."""
    from vmrframe_tpu.registry import get_model_entry

    entry = get_model_entry(model_name)
    return entry.loss_fn, entry.infer_fn


def iou_n1(candidates: np.ndarray, gt) -> np.ndarray:
    """(N, 2) candidate spans vs one gt span (utils/utils.py:266-276)."""
    from vmrframe_tpu.data.labels import iou_1d

    return iou_1d(np.asarray(candidates, dtype=np.float64), gt)


def score2d_to_moments_scores(score2d: np.ndarray, num_clips: int, duration: float):
    """Nonzero 2D cells -> (moments in seconds, scores)
    (utils/utils.py:279-284)."""
    grids = np.argwhere(score2d)
    scores = score2d[grids[:, 0], grids[:, 1]]
    grids = grids.astype(np.float64)
    grids[:, 1] += 1
    moments = grids * duration / num_clips
    return moments, scores
