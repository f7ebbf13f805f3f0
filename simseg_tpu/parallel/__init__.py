from simseg_tpu.parallel.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    PIPE_AXIS,
    REPLICA_AXIS,
    batch_axes,
    batch_shards,
    data_sharding,
    init_distributed,
    local_batch_size,
    make_mesh,
    replicated,
    shard_batch,
)
from simseg_tpu.parallel.pp import (
    make_pp_forward,
    pipeline_blocks,
    pp_image_tokens,
    stack_block_params,
)
from simseg_tpu.parallel.tp import ep_shardings, place_params_tp, tp_shardings

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "PIPE_AXIS",
    "REPLICA_AXIS",
    "batch_axes",
    "batch_shards",
    "data_sharding",
    "ep_shardings",
    "init_distributed",
    "local_batch_size",
    "make_mesh",
    "make_pp_forward",
    "pipeline_blocks",
    "place_params_tp",
    "pp_image_tokens",
    "replicated",
    "shard_batch",
    "stack_block_params",
    "tp_shardings",
]
