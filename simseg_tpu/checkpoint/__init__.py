from simseg_tpu.checkpoint.native import (
    dump_config_snapshot,
    has_checkpoint,
    load_checkpoint,
    load_params,
    save_checkpoint,
)
from simseg_tpu.checkpoint.torch_bridge import (
    clip_mapping_table,
    convert_keys,
    load_clip_checkpoint,
    load_torch_state_dict,
    torch_to_flax,
)
from simseg_tpu.checkpoint.torch_export import (
    flax_to_torch,
    save_clip_checkpoint,
)


def load_pretrained_params(path: str, params, cfg, strict: bool = False):
    """Load model parameters from either checkpoint family by extension:
    torch ``.pth``/``.pt`` goes through the reference-layout bridge, anything
    else is treated as a native checkpoint (a concrete checkpoint directory
    or a ``ckpt.dir`` with a ``latest_ckpt`` pointer). Shared by the eval
    tools and the serving exporter.

    ``strict=True`` makes a ``.pth`` load refuse missing / shape-mismatched
    keys instead of silently keeping the template's random init — required
    when the result is re-exported as if trained (tools/export_torch_checkpoint)."""
    if path.endswith((".pth", ".pt")):
        new_params, _report = load_clip_checkpoint(
            path, params, projection=cfg.model.projection.name, strict=strict)
        return new_params
    return load_params(path, params)


__all__ = [
    "dump_config_snapshot",
    "has_checkpoint",
    "load_checkpoint",
    "load_params",
    "load_pretrained_params",
    "save_checkpoint",
    "clip_mapping_table",
    "convert_keys",
    "load_clip_checkpoint",
    "load_torch_state_dict",
    "torch_to_flax",
    "flax_to_torch",
    "save_clip_checkpoint",
]
