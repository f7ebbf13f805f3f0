from simseg_tpu.parallel.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    REPLICA_AXIS,
    batch_axes,
    batch_shards,
    data_sharding,
    device_prefetch,
    init_distributed,
    local_batch_size,
    make_mesh,
    replicated,
    shard_batch,
)
from simseg_tpu.parallel.tp import place_params_tp, tp_shardings

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "REPLICA_AXIS",
    "batch_axes",
    "batch_shards",
    "data_sharding",
    "device_prefetch",
    "init_distributed",
    "local_batch_size",
    "make_mesh",
    "place_params_tp",
    "replicated",
    "shard_batch",
    "tp_shardings",
]
