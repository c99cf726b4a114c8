from stemseg_tpu.parallel.mesh import (  # noqa: F401
    DATA_AXIS,
    batch_sharding,
    create_mesh,
    replicate,
    replicated_sharding,
    shard_batch,
)
