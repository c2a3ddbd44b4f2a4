from vmrframe_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    replicated,
    initialize_multihost,
    local_batch_slice,
)
