"""flax pytree -> torch ``.pth`` checkpoint export (the reverse bridge).

Closes the migration loop (docs/MIGRATION.md): models trained in this
framework can be exported as a checkpoint in the reference's published
state-dict layout, so the original PyTorch SimSeg codebase — or any torch
tooling built around it — can load them with ``strict=True``. The key
names and weight layouts are the exact inverse of the loading bridge
(torch_bridge.py), and a round trip through both is bit-identical
(tests/test_torch_export.py).

Reference checkpoint container format: ``{state_dict, meta}``
(core/hooks/checkpoint.py:14-45); BN towers additionally carry torch's
``num_batches_tracked`` buffers, synthesized as zeros here so a strict
``load_state_dict`` into a torchvision/timm ResNet succeeds.

Weight layout conversions (flax -> torch; inverse of torch_bridge.py):
- Linear:  kernel (in, out)      -> weight (out, in)      [transpose]
- Conv2d:  kernel (kh, kw, I, O) -> weight (O, I, kh, kw)
- Embedding: embedding -> weight (unchanged)
- LayerNorm: scale -> weight, bias -> bias
- BatchNorm stats: batch_stats mean/var -> running_mean/running_var
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Tuple

import numpy as np

from simseg_tpu.utils.logger import logger


def _t(x: np.ndarray) -> np.ndarray:  # linear kernel -> torch weight
    return np.asarray(x).T


def _inv_conv(x: np.ndarray) -> np.ndarray:  # (kh, kw, I, O) -> (O, I, kh, kw)
    return np.transpose(np.asarray(x), (3, 2, 0, 1))


_LN = {"scale": "weight", "bias": "bias"}
_BN_STAT = {"mean": "running_mean", "var": "running_var"}


def _image_param_entries(prefix: str):
    """(path_regex, torch_name_fn, convert) over '/'-joined flax paths
    relative to the image tower root — inverse of torch_bridge's
    ``_vit_entries`` + ``_resnet_entries`` param rows."""
    # --- timm ViT ---
    yield (r"^cls_token$", lambda m: f"{prefix}cls_token", None)
    yield (r"^pos_embed$", lambda m: f"{prefix}pos_embed", None)
    yield (r"^patch_embed/kernel$",
           lambda m: f"{prefix}patch_embed.proj.weight", _inv_conv)
    yield (r"^patch_embed/bias$",
           lambda m: f"{prefix}patch_embed.proj.bias", None)
    yield (r"^norm/(scale|bias)$",
           lambda m: f"{prefix}norm.{_LN[m.group(1)]}", None)
    yield (r"^blocks_(\d+)/(norm1|norm2)/(scale|bias)$",
           lambda m: f"{prefix}blocks.{m.group(1)}.{m.group(2)}."
                     f"{_LN[m.group(3)]}", None)
    yield (r"^blocks_(\d+)/attn/(qkv|proj)/kernel$",
           lambda m: f"{prefix}blocks.{m.group(1)}.attn.{m.group(2)}.weight",
           _t)
    yield (r"^blocks_(\d+)/attn/(qkv|proj)/bias$",
           lambda m: f"{prefix}blocks.{m.group(1)}.attn.{m.group(2)}.bias",
           None)
    yield (r"^blocks_(\d+)/mlp/(fc1|fc2)/kernel$",
           lambda m: f"{prefix}blocks.{m.group(1)}.mlp.{m.group(2)}.weight",
           _t)
    yield (r"^blocks_(\d+)/mlp/(fc1|fc2)/bias$",
           lambda m: f"{prefix}blocks.{m.group(1)}.mlp.{m.group(2)}.bias",
           None)
    # --- torchvision/timm ResNet (params; stats ride batch_stats below) ---
    yield (r"^conv1/kernel$", lambda m: f"{prefix}conv1.weight", _inv_conv)
    yield (r"^bn1/(scale|bias)$",
           lambda m: f"{prefix}bn1.{_LN[m.group(1)]}", None)
    yield (r"^layer(\d+)_(\d+)/conv(\d)/kernel$",
           lambda m: f"{prefix}layer{m.group(1)}.{m.group(2)}."
                     f"conv{m.group(3)}.weight", _inv_conv)
    yield (r"^layer(\d+)_(\d+)/bn(\d)/(scale|bias)$",
           lambda m: f"{prefix}layer{m.group(1)}.{m.group(2)}."
                     f"bn{m.group(3)}.{_LN[m.group(4)]}", None)
    yield (r"^layer(\d+)_(\d+)/downsample_conv/kernel$",
           lambda m: f"{prefix}layer{m.group(1)}.{m.group(2)}."
                     "downsample.0.weight", _inv_conv)
    yield (r"^layer(\d+)_(\d+)/downsample_bn/(scale|bias)$",
           lambda m: f"{prefix}layer{m.group(1)}.{m.group(2)}."
                     f"downsample.1.{_LN[m.group(3)]}", None)
    # --- timm ConvNeXt (inverse of torch_bridge._convnext_entries) ---
    yield (r"^stem_conv/kernel$", lambda m: f"{prefix}stem.0.weight",
           _inv_conv)
    yield (r"^stem_conv/bias$", lambda m: f"{prefix}stem.0.bias", None)
    yield (r"^stem_norm/(scale|bias)$",
           lambda m: f"{prefix}stem.1.{_LN[m.group(1)]}", None)
    yield (r"^downsample_norm(\d+)/(scale|bias)$",
           lambda m: f"{prefix}stages.{m.group(1)}.downsample.0."
                     f"{_LN[m.group(2)]}", None)
    yield (r"^downsample_conv(\d+)/kernel$",
           lambda m: f"{prefix}stages.{m.group(1)}.downsample.1.weight",
           _inv_conv)
    yield (r"^downsample_conv(\d+)/bias$",
           lambda m: f"{prefix}stages.{m.group(1)}.downsample.1.bias", None)
    yield (r"^stage(\d+)_block(\d+)/conv_dw/kernel$",
           lambda m: f"{prefix}stages.{m.group(1)}.blocks.{m.group(2)}."
                     "conv_dw.weight", _inv_conv)
    yield (r"^stage(\d+)_block(\d+)/conv_dw/bias$",
           lambda m: f"{prefix}stages.{m.group(1)}.blocks.{m.group(2)}."
                     "conv_dw.bias", None)
    yield (r"^stage(\d+)_block(\d+)/norm/(scale|bias)$",
           lambda m: f"{prefix}stages.{m.group(1)}.blocks.{m.group(2)}."
                     f"norm.{_LN[m.group(3)]}", None)
    yield (r"^stage(\d+)_block(\d+)/(fc1|fc2)/kernel$",
           lambda m: f"{prefix}stages.{m.group(1)}.blocks.{m.group(2)}."
                     f"mlp.{m.group(3)}.weight", _t)
    yield (r"^stage(\d+)_block(\d+)/(fc1|fc2)/bias$",
           lambda m: f"{prefix}stages.{m.group(1)}.blocks.{m.group(2)}."
                     f"mlp.{m.group(3)}.bias", None)
    yield (r"^stage(\d+)_block(\d+)/gamma$",
           lambda m: f"{prefix}stages.{m.group(1)}.blocks.{m.group(2)}."
                     "gamma", None)
    yield (r"^head_norm/(scale|bias)$",
           lambda m: f"{prefix}head.norm.{_LN[m.group(1)]}", None)
    # --- timm EfficientNet (inverse of torch_bridge._efficientnet_entries;
    #     bn1 params ride the ResNet bn1 entry above) ---
    yield (r"^conv_stem/kernel$", lambda m: f"{prefix}conv_stem.weight",
           _inv_conv)
    yield (r"^bn2/(scale|bias)$",
           lambda m: f"{prefix}bn2.{_LN[m.group(1)]}", None)
    yield (r"^conv_head/kernel$", lambda m: f"{prefix}conv_head.weight",
           _inv_conv)
    yield (r"^blocks_(\d+)_(\d+)/(conv_pw|conv_dw|conv_pwl)/kernel$",
           lambda m: f"{prefix}blocks.{m.group(1)}.{m.group(2)}."
                     f"{m.group(3)}.weight", _inv_conv)
    yield (r"^blocks_(\d+)_(\d+)/(bn\d)/(scale|bias)$",
           lambda m: f"{prefix}blocks.{m.group(1)}.{m.group(2)}."
                     f"{m.group(3)}.{_LN[m.group(4)]}", None)
    yield (r"^blocks_(\d+)_(\d+)/se/(conv_reduce|conv_expand)/kernel$",
           lambda m: f"{prefix}blocks.{m.group(1)}.{m.group(2)}.se."
                     f"{m.group(3)}.weight", _inv_conv)
    yield (r"^blocks_(\d+)_(\d+)/se/(conv_reduce|conv_expand)/bias$",
           lambda m: f"{prefix}blocks.{m.group(1)}.{m.group(2)}.se."
                     f"{m.group(3)}.bias", None)


def _image_stat_entries(prefix: str):
    """batch_stats collection -> torch running_mean/running_var buffers."""
    yield (r"^bn1/(mean|var)$",
           lambda m: f"{prefix}bn1.{_BN_STAT[m.group(1)]}", None)
    yield (r"^layer(\d+)_(\d+)/bn(\d)/(mean|var)$",
           lambda m: f"{prefix}layer{m.group(1)}.{m.group(2)}."
                     f"bn{m.group(3)}.{_BN_STAT[m.group(4)]}", None)
    yield (r"^layer(\d+)_(\d+)/downsample_bn/(mean|var)$",
           lambda m: f"{prefix}layer{m.group(1)}.{m.group(2)}."
                     f"downsample.1.{_BN_STAT[m.group(3)]}", None)
    # --- timm EfficientNet (bn1 stats ride the ResNet bn1 entry above) ---
    yield (r"^bn2/(mean|var)$",
           lambda m: f"{prefix}bn2.{_BN_STAT[m.group(1)]}", None)
    yield (r"^blocks_(\d+)_(\d+)/(bn\d)/(mean|var)$",
           lambda m: f"{prefix}blocks.{m.group(1)}.{m.group(2)}."
                     f"{m.group(3)}.{_BN_STAT[m.group(4)]}", None)


def _text_param_entries(prefix: str):
    """Inverse of torch_bridge's ``_bert_entries`` (HF BERT layout)."""
    for flax_name, torch_name in [
        ("word_embeddings", "embeddings.word_embeddings"),
        ("position_embeddings", "embeddings.position_embeddings"),
        ("token_type_embeddings", "embeddings.token_type_embeddings"),
    ]:
        yield (rf"^{flax_name}/embedding$",
               lambda m, tn=torch_name: f"{prefix}{tn}.weight", None)
    yield (r"^embeddings_norm/(scale|bias)$",
           lambda m: f"{prefix}embeddings.LayerNorm.{_LN[m.group(1)]}", None)
    yield (r"^layer_(\d+)/(query|key|value)/kernel$",
           lambda m: f"{prefix}encoder.layer.{m.group(1)}.attention.self."
                     f"{m.group(2)}.weight", _t)
    yield (r"^layer_(\d+)/(query|key|value)/bias$",
           lambda m: f"{prefix}encoder.layer.{m.group(1)}.attention.self."
                     f"{m.group(2)}.bias", None)
    for flax_mod, torch_mod, is_linear in [
        ("attention_output", "attention.output.dense", True),
        ("attention_norm", "attention.output.LayerNorm", False),
        ("intermediate", "intermediate.dense", True),
        ("output", "output.dense", True),
        ("output_norm", "output.LayerNorm", False),
    ]:
        if is_linear:
            yield (rf"^layer_(\d+)/{flax_mod}/kernel$",
                   lambda m, tm=torch_mod:
                       f"{prefix}encoder.layer.{m.group(1)}.{tm}.weight", _t)
            yield (rf"^layer_(\d+)/{flax_mod}/bias$",
                   lambda m, tm=torch_mod:
                       f"{prefix}encoder.layer.{m.group(1)}.{tm}.bias", None)
        else:
            yield (rf"^layer_(\d+)/{flax_mod}/(scale|bias)$",
                   lambda m, tm=torch_mod:
                       f"{prefix}encoder.layer.{m.group(1)}.{tm}."
                       f"{_LN[m.group(2)]}", None)


def _projection_entries(torch_prefix: str, projection: str):
    """Inverse of torch_bridge's ``_projection_entries``."""
    if projection == "simple":
        yield (r"^linear/kernel$",
               lambda m: f"{torch_prefix}.linear.weight", _t)
    else:
        for flax_mod, torch_mod, is_linear in [
            ("projection", "projection", True),
            ("fc", "fc", True),
            ("layer_norm", "layer_norm", False),
        ]:
            if is_linear:
                yield (rf"^{flax_mod}/kernel$",
                       lambda m, tm=torch_mod:
                           f"{torch_prefix}.{tm}.weight", _t)
                yield (rf"^{flax_mod}/bias$",
                       lambda m, tm=torch_mod:
                           f"{torch_prefix}.{tm}.bias", None)
            else:
                yield (rf"^{flax_mod}/(scale|bias)$",
                       lambda m, tm=torch_mod:
                           f"{torch_prefix}.{tm}.{_LN[m.group(1)]}", None)


def _tree_paths(tree, prefix=()):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _tree_paths(v, prefix + (k,))
    else:
        yield prefix, tree


def _export_subtree(tree, table, out: Dict[str, np.ndarray],
                    skipped: List[str], scope: str) -> None:
    table = list(table)
    for path, leaf in _tree_paths(tree):
        joined = "/".join(path)
        for pattern, name_fn, cv in table:
            m = re.match(pattern, joined)
            if m:
                arr = cv(leaf) if cv is not None else np.asarray(leaf)
                out[name_fn(m)] = arr.astype(np.float32)
                break
        else:
            skipped.append(f"{scope}/{joined}")


# torch prefixes of the reference CLIPModel's towers: both wrap their
# backbone TWO modules deep — ImageEncoder.model = ViTModel whose .model is
# the timm ViT (vit_builder.py:8-11), TextEncoder.model = HuggingFaceModel
# whose .model is the AutoModel BERT (huggingface_builder.py:6-14); the
# reference itself addresses image_encoder.model.model.pos_embed
# (tools/seg_evaluation.py:228-230).
_IMG_PREFIX = "image_encoder.model.model."
_TXT_PREFIX = "text_encoder.model.model."


def flax_to_torch(
    variables,
    projection: str = "simple",
    strict: bool = True,
) -> Tuple[Dict[str, np.ndarray], Dict[str, List[str]]]:
    """Convert a flax CLIPModel variables dict (``{'params': ...}`` plus an
    optional ``'batch_stats'`` collection for CNN towers) into a flat torch
    state dict ``{name: np.float32 array}`` in the reference's layout.

    Exact inverse of ``torch_bridge.clip_mapping_table``: loading the
    result back through ``torch_to_flax`` reproduces the input tree
    bit-for-bit. ``num_batches_tracked`` buffers (int64 zeros) are added
    for every exported BatchNorm so torch-side ``load_state_dict(...,
    strict=True)`` succeeds.

    Returns (state_dict, report); report lists exported/skipped keys.
    With ``strict=True`` any unmapped leaf (e.g. a knob the reference has
    no slot for) raises instead of being dropped silently.
    """
    if isinstance(variables, dict) and "params" in variables:
        collections = variables
    else:  # a bare params tree
        collections = {"params": variables}
    params = collections["params"]
    out: Dict[str, np.ndarray] = {}
    skipped: List[str] = []

    # any collection other than params/batch_stats (e.g. a future quant or
    # cache collection) has no slot in the reference layout — route it into
    # `skipped` so strict mode refuses it instead of dropping it silently
    for coll_name, coll in collections.items():
        if coll_name in ("params", "batch_stats"):
            continue
        skipped.extend(f"{coll_name}/" + "/".join(p)
                       for p, _ in _tree_paths(coll))

    for name, subtree in params.items():
        if name == "image_encoder":
            _export_subtree(subtree, _image_param_entries(_IMG_PREFIX),
                            out, skipped, "params/image_encoder")
        elif name == "text_encoder":
            _export_subtree(subtree, _text_param_entries(_TXT_PREFIX),
                            out, skipped, "params/text_encoder")
        elif name in ("image_projection", "text_projection"):
            _export_subtree(subtree, _projection_entries(name, projection),
                            out, skipped, f"params/{name}")
        elif name == "temperature":
            out["loss.temperature"] = np.asarray(subtree, np.float32)
        else:
            skipped.extend(
                f"params/{name}/" + "/".join(p)
                for p, _ in _tree_paths(subtree))

    stats = collections.get("batch_stats")
    if stats:
        for name, subtree in stats.items():
            if name == "image_encoder":
                _export_subtree(subtree, _image_stat_entries(_IMG_PREFIX),
                                out, skipped, "batch_stats/image_encoder")
            else:
                skipped.extend(
                    f"batch_stats/{name}/" + "/".join(p)
                    for p, _ in _tree_paths(subtree))
        # torch BN modules carry a num_batches_tracked buffer; synthesize
        # zeros so strict torch-side loads see a complete module state.
        for key in [k for k in out if k.endswith(".running_mean")]:
            out[key[:-len("running_mean")] + "num_batches_tracked"] = (
                np.zeros((), np.int64))

    report = {"exported": sorted(out), "skipped": skipped}
    if skipped:
        msg = (f"flax->torch: {len(skipped)} leaves have no slot in the "
               f"reference layout: {skipped}")
        if strict:
            raise ValueError(msg)
        logger.warning(msg)
    logger.info(f"flax->torch: exported {len(out)} tensors")
    return out, report


def save_clip_checkpoint(
    path: str,
    variables,
    projection: str = "simple",
    meta: Optional[dict] = None,
    strict: bool = True,
) -> Dict[str, List[str]]:
    """Write ``variables`` as a reference-format torch checkpoint
    ``{'state_dict': ..., 'meta': ...}`` (the container the reference's
    CheckpointHook emits and its eval tools consume). The file loads back
    through ``load_clip_checkpoint`` bit-identically, and into the
    reference's own CLIPModel via ``load_state_dict(..., strict=True)``."""
    import torch

    state, report = flax_to_torch(variables, projection=projection,
                                  strict=strict)
    payload = {
        # np.array (not ascontiguousarray, which promotes 0-d to 1-d and
        # would turn the scalar temperature into shape (1,)) — a fresh
        # copy is C-contiguous and shape-preserving for torch.from_numpy
        "state_dict": {k: torch.from_numpy(np.array(v))
                       for k, v in state.items()},
        "meta": dict(meta or {}),
    }
    torch.save(payload, path)
    logger.info(f"Saved reference-layout torch checkpoint {path} "
                f"({len(state)} tensors)")
    return report
