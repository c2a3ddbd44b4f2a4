"""Model zoo — importing this package registers every model."""

import vmrframe_tpu.models.seqpan  # noqa: F401
import vmrframe_tpu.models.basefast  # noqa: F401
import vmrframe_tpu.models.backbone  # noqa: F401
import vmrframe_tpu.models.actionformer  # noqa: F401
import vmrframe_tpu.models.backbone_actionformer  # noqa: F401
import vmrframe_tpu.models.ban  # noqa: F401
import vmrframe_tpu.models.cca  # noqa: F401
import vmrframe_tpu.models.distill  # noqa: F401
import vmrframe_tpu.models.cpl  # noqa: F401
import vmrframe_tpu.models.sentence_variants  # noqa: F401
