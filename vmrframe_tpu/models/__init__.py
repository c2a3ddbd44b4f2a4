"""Model zoo — importing this package registers every model."""

import vmrframe_tpu.models.seqpan  # noqa: F401
