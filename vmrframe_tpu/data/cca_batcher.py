"""CCA batch assembly — the base pipeline plus the (L, L) IoU map label
(collate_fn_CCA, models/CCA.py:400-456; get_label2d, utils/BaseDataset.py:136-144).

The reference has no working CCADataset class (models/CCA.py never defines
one, so its eval()-dispatch NameErrors); we ride the standard pipeline.
"""

from __future__ import annotations

import random
from typing import Dict, List

import numpy as np

from vmrframe_tpu.data.batcher import Batcher
from vmrframe_tpu.data.labels import iou2d_label


class CCABatcher(Batcher):
    def make_batch(self, indices: List[int], rng: random.Random) -> Dict[str, np.ndarray]:
        batch = super().make_batch(indices, rng)
        L = self.vlen
        label2ds = np.zeros((self.batch_size, L, L), dtype=np.float32)
        for slot, idx in enumerate(indices):
            record = self.dataset[idx]
            stime, etime = record["se_time"]
            label2ds[slot] = iou2d_label(stime, etime, record["duration"], L, end_plus_one=True)
        batch["label2ds"] = label2ds
        return batch
