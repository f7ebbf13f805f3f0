from simseg_tpu.checkpoint.native import (
    dump_config_snapshot,
    has_checkpoint,
    load_checkpoint,
    save_checkpoint,
)
from simseg_tpu.checkpoint.torch_bridge import (
    clip_mapping_table,
    convert_keys,
    load_clip_checkpoint,
    load_torch_state_dict,
    torch_to_flax,
)

__all__ = [
    "dump_config_snapshot",
    "has_checkpoint",
    "load_checkpoint",
    "save_checkpoint",
    "clip_mapping_table",
    "convert_keys",
    "load_clip_checkpoint",
    "load_torch_state_dict",
    "torch_to_flax",
]
