"""vmrframe_tpu — a TPU-native (JAX / XLA / Pallas / pjit) framework for
video moment retrieval (temporal grounding of natural-language queries in
videos).

Built from scratch with the capabilities of the PyTorch reference
``renjie-liang/VMRFrame`` (see SURVEY.md): a config-driven trainer/eval
engine, a static-shape feature/label pipeline, and a model zoo (SeqPAN,
BaseFast, BackBone variants, BAN, CCA, ActionFormer, CPL, and the
teacher→student distillation workflow) — redesigned TPU-first:

- all shapes static; masks are explicit arrays (reference: mask_logits
  additive -1e30 masking, models/layers.py:9-12),
- one jitted train step = forward + loss + grad + optimizer update +
  on-device span inference + IoU metrics,
- data parallel over a ``jax.sharding.Mesh`` via NamedSharding (the
  idiomatic replacement for the reference's nn.DataParallel, main.py:22-24),
- Pallas kernels for the hot fused attention ops.
"""

__version__ = "0.1.0"

from vmrframe_tpu.config import Config, load_config
from vmrframe_tpu.registry import MODEL_REGISTRY, register_model, get_model_entry
