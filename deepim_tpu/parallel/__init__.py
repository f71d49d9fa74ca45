"""Mesh/sharding helpers: the XLA-collective replacement for the reference's
``DataParallelExecutorGroup`` + MXNet kvstore data parallelism."""

from deepim_tpu.parallel.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    make_mesh,
    replicate,
    replicated,
    shard_batch,
    shard_params_for_tp,
)
from deepim_tpu.parallel.distributed import (
    global_mesh,
    initialize_multihost,
    process_local_batch_size,
)
