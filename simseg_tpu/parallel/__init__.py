from simseg_tpu.parallel.mesh import (
    DATA_AXIS,
    REPLICA_AXIS,
    data_sharding,
    device_prefetch,
    init_distributed,
    local_batch_size,
    make_mesh,
    replicated,
    shard_batch,
)

__all__ = [
    "DATA_AXIS",
    "REPLICA_AXIS",
    "data_sharding",
    "device_prefetch",
    "init_distributed",
    "local_batch_size",
    "make_mesh",
    "replicated",
    "shard_batch",
]
