"""torch ``.pth`` -> JAX pytree checkpoint bridge.

Loads the reference's published SimSeg checkpoints (and raw timm-ViT / HF-BERT
state dicts) into the flax parameter tree so zero-shot evaluation works
without retraining (SURVEY.md §5 checkpoint/resume; §7 hard-part 2).

Parity notes:
- reference checkpoint format: ``{state_dict|model, optimizer, meta, scaler}``
  (core/hooks/checkpoint.py:14-45); legacy-key normalization strips a
  ``module.`` prefix and renames ``model_state_dict`` -> ``model``
  (tasks/clip/hooks/checkpoint.py:58-76)
- prefix-rewrite rules 'a->b' and filter_state diagnostics
  (utils/checkpoint_utils.py:4-36)
- pos-embed interpolation on grid mismatch (utils/interpolate_pe.py,
  applied at seg_evaluation.py:228-231).

Weight layout conversions (torch -> flax):
- Linear:  weight (out, in)  -> kernel (in, out)  [transpose]
- Conv2d:  weight (O, I, kh, kw) -> kernel (kh, kw, I, O)
- Embedding: weight -> embedding (unchanged)
- LayerNorm: weight -> scale, bias -> bias
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Tuple

import numpy as np

from simseg_tpu.ops.interpolate_pe import interpolate_pos_embed
from simseg_tpu.utils.logger import logger


# --------------------------------------------------------------------------
# torch pickle reading
# --------------------------------------------------------------------------

def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Read a torch checkpoint file into a flat {name: np.ndarray} dict.

    Accepts the reference's full checkpoint format or a bare state dict;
    normalizes legacy keys (parity: tasks/clip/hooks/checkpoint.py:58-76).
    """
    import torch

    try:
        obj = torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        obj = torch.load(path, map_location="cpu", weights_only=False)

    if isinstance(obj, dict):
        for key in ("state_dict", "model", "model_state_dict"):
            if key in obj and isinstance(obj[key], dict):
                obj = obj[key]
                break
    out: Dict[str, np.ndarray] = {}
    for k, v in obj.items():
        if hasattr(v, "detach"):
            name = k[len("module."):] if k.startswith("module.") else k
            out[name] = v.detach().to(torch.float32).cpu().numpy()
    return out


def convert_keys(state: Dict[str, np.ndarray], rules: List[str]) -> Dict[str, np.ndarray]:
    """Apply 'old_prefix->new_prefix' rewrite rules
    (parity: utils/checkpoint_utils.py:4-20)."""
    out = {}
    for k, v in state.items():
        for rule in rules:
            old, _, new = rule.partition("->")
            if k.startswith(old):
                k = new + k[len(old):]
                break
        out[k] = v
    return out


# --------------------------------------------------------------------------
# name mapping: reference CLIPModel torch names -> flax tree paths
# --------------------------------------------------------------------------

def _vit_entries(prefix: str, dest: Tuple[str, ...]):
    """Yield (regex, path_fn, convert_fn) for a timm ViT under ``prefix``."""
    P = re.escape(prefix)

    def t(x):  # linear weight transpose
        return x.T

    def conv(x):  # (O, I, kh, kw) -> (kh, kw, I, O)
        return np.transpose(x, (2, 3, 1, 0))

    yield (rf"^{P}cls_token$", lambda m: dest + ("cls_token",), None)
    yield (rf"^{P}pos_embed$", lambda m: dest + ("pos_embed",), None)
    yield (rf"^{P}patch_embed\.proj\.weight$", lambda m: dest + ("patch_embed", "kernel"), conv)
    yield (rf"^{P}patch_embed\.proj\.bias$", lambda m: dest + ("patch_embed", "bias"), None)
    for ln, (w, b) in {"norm": ("scale", "bias")}.items():
        yield (rf"^{P}{ln}\.weight$", lambda m, ln=ln: dest + (ln, "scale"), None)
        yield (rf"^{P}{ln}\.bias$", lambda m, ln=ln: dest + (ln, "bias"), None)
    blk = rf"^{P}blocks\.(\d+)\."
    for torch_name, path_tail, cv in [
        ("norm1.weight", ("norm1", "scale"), None),
        ("norm1.bias", ("norm1", "bias"), None),
        ("norm2.weight", ("norm2", "scale"), None),
        ("norm2.bias", ("norm2", "bias"), None),
        ("attn.qkv.weight", ("attn", "qkv", "kernel"), t),
        ("attn.qkv.bias", ("attn", "qkv", "bias"), None),
        ("attn.proj.weight", ("attn", "proj", "kernel"), t),
        ("attn.proj.bias", ("attn", "proj", "bias"), None),
        ("mlp.fc1.weight", ("mlp", "fc1", "kernel"), t),
        ("mlp.fc1.bias", ("mlp", "fc1", "bias"), None),
        ("mlp.fc2.weight", ("mlp", "fc2", "kernel"), t),
        ("mlp.fc2.bias", ("mlp", "fc2", "bias"), None),
    ]:
        yield (
            blk + re.escape(torch_name) + "$",
            lambda m, tail=path_tail: dest + (f"blocks_{m.group(1)}",) + tail,
            cv,
        )


def _bert_entries(prefix: str, dest: Tuple[str, ...]):
    P = re.escape(prefix)

    def t(x):
        return x.T

    for torch_name, path, cv in [
        ("embeddings.word_embeddings.weight", ("word_embeddings", "embedding"), None),
        ("embeddings.position_embeddings.weight", ("position_embeddings", "embedding"), None),
        ("embeddings.token_type_embeddings.weight", ("token_type_embeddings", "embedding"), None),
        ("embeddings.LayerNorm.weight", ("embeddings_norm", "scale"), None),
        ("embeddings.LayerNorm.bias", ("embeddings_norm", "bias"), None),
    ]:
        yield (rf"^{P}{re.escape(torch_name)}$", lambda m, p=path: dest + p, cv)

    layer = rf"^{P}encoder\.layer\.(\d+)\."
    for torch_name, tail, cv in [
        ("attention.self.query.weight", ("query", "kernel"), t),
        ("attention.self.query.bias", ("query", "bias"), None),
        ("attention.self.key.weight", ("key", "kernel"), t),
        ("attention.self.key.bias", ("key", "bias"), None),
        ("attention.self.value.weight", ("value", "kernel"), t),
        ("attention.self.value.bias", ("value", "bias"), None),
        ("attention.output.dense.weight", ("attention_output", "kernel"), t),
        ("attention.output.dense.bias", ("attention_output", "bias"), None),
        ("attention.output.LayerNorm.weight", ("attention_norm", "scale"), None),
        ("attention.output.LayerNorm.bias", ("attention_norm", "bias"), None),
        ("intermediate.dense.weight", ("intermediate", "kernel"), t),
        ("intermediate.dense.bias", ("intermediate", "bias"), None),
        ("output.dense.weight", ("output", "kernel"), t),
        ("output.dense.bias", ("output", "bias"), None),
        ("output.LayerNorm.weight", ("output_norm", "scale"), None),
        ("output.LayerNorm.bias", ("output_norm", "bias"), None),
    ]:
        yield (
            layer + re.escape(torch_name) + "$",
            lambda m, tl=tail: dest + (f"layer_{m.group(1)}",) + tl,
            cv,
        )


def _resnet_entries(prefix: str, params_dest: Tuple[str, ...],
                    stats_dest: Tuple[str, ...]):
    """(regex, path_fn, convert_fn) entries for a torchvision/timm ResNet
    under ``prefix``. BN statistics land in the ``batch_stats`` collection."""
    P = re.escape(prefix)

    def conv(x):  # (O, I, kh, kw) -> (kh, kw, I, O)
        return np.transpose(x, (2, 3, 1, 0))

    def bn_entries(torch_bn: str, flax_bn: str, scope_regex: str, scoped: bool):
        for suffix, dest_root, leaf in [
            ("weight", params_dest, "scale"),
            ("bias", params_dest, "bias"),
            ("running_mean", stats_dest, "mean"),
            ("running_var", stats_dest, "var"),
        ]:
            if scoped:
                yield (
                    scope_regex + re.escape(f"{torch_bn}.{suffix}") + "$",
                    lambda m, root=dest_root, fb=flax_bn, lf=leaf:
                        root + (f"layer{m.group(1)}_{m.group(2)}", fb, lf),
                    None,
                )
            else:
                yield (
                    rf"^{P}{re.escape(f'{torch_bn}.{suffix}')}$",
                    lambda m, root=dest_root, fb=flax_bn, lf=leaf: root + (fb, lf),
                    None,
                )

    # stem
    yield (rf"^{P}conv1\.weight$", lambda m: params_dest + ("conv1", "kernel"), conv)
    yield from bn_entries("bn1", "bn1", "", scoped=False)

    blk = rf"^{P}layer(\d+)\.(\d+)\."
    for n in (1, 2, 3):
        yield (
            blk + re.escape(f"conv{n}.weight") + "$",
            lambda m, n=n: params_dest + (f"layer{m.group(1)}_{m.group(2)}",
                                          f"conv{n}", "kernel"),
            conv,
        )
        yield from bn_entries(f"bn{n}", f"bn{n}", blk, scoped=True)
    yield (
        blk + re.escape("downsample.0.weight") + "$",
        lambda m: params_dest + (f"layer{m.group(1)}_{m.group(2)}",
                                 "downsample_conv", "kernel"),
        conv,
    )
    yield from bn_entries("downsample.1", "downsample_bn", blk, scoped=True)


def _convnext_entries(prefix: str, params_dest: Tuple[str, ...]):
    """(regex, path_fn, convert_fn) entries for a timm-0.6.x ConvNeXt under
    ``prefix`` (models/convnext.py layout; no BN — everything is params)."""
    P = re.escape(prefix)

    def conv(x):  # (O, I', kh, kw) -> (kh, kw, I', O); depthwise included
        return np.transpose(x, (2, 3, 1, 0))

    def t(x):
        return x.T

    ln = {"weight": "scale", "bias": "bias"}
    yield (rf"^{P}stem\.0\.weight$",
           lambda m: params_dest + ("stem_conv", "kernel"), conv)
    yield (rf"^{P}stem\.0\.bias$",
           lambda m: params_dest + ("stem_conv", "bias"), None)
    yield (rf"^{P}stem\.1\.(weight|bias)$",
           lambda m: params_dest + ("stem_norm", ln[m.group(1)]), None)
    yield (rf"^{P}stages\.(\d+)\.downsample\.0\.(weight|bias)$",
           lambda m: params_dest + (f"downsample_norm{m.group(1)}",
                                    ln[m.group(2)]), None)
    yield (rf"^{P}stages\.(\d+)\.downsample\.1\.weight$",
           lambda m: params_dest + (f"downsample_conv{m.group(1)}", "kernel"),
           conv)
    yield (rf"^{P}stages\.(\d+)\.downsample\.1\.bias$",
           lambda m: params_dest + (f"downsample_conv{m.group(1)}", "bias"),
           None)
    blk = rf"^{P}stages\.(\d+)\.blocks\.(\d+)\."

    def bdst(m, *tail):
        return params_dest + (f"stage{m.group(1)}_block{m.group(2)}",) + tail

    yield (blk + r"conv_dw\.weight$",
           lambda m: bdst(m, "conv_dw", "kernel"), conv)
    yield (blk + r"conv_dw\.bias$", lambda m: bdst(m, "conv_dw", "bias"), None)
    yield (blk + r"norm\.(weight|bias)$",
           lambda m: bdst(m, "norm", ln[m.group(3)]), None)
    yield (blk + r"mlp\.(fc1|fc2)\.weight$",
           lambda m: bdst(m, m.group(3), "kernel"), t)
    yield (blk + r"mlp\.(fc1|fc2)\.bias$",
           lambda m: bdst(m, m.group(3), "bias"), None)
    yield (blk + r"gamma$", lambda m: bdst(m, "gamma"), None)
    yield (rf"^{P}head\.norm\.(weight|bias)$",
           lambda m: params_dest + ("head_norm", ln[m.group(1)]), None)


def _efficientnet_entries(prefix: str, params_dest: Tuple[str, ...],
                          stats_dest: Tuple[str, ...]):
    """(regex, path_fn, convert_fn) entries for a timm-0.6.x (plain)
    EfficientNet under ``prefix`` (models/efficientnet.py layout)."""
    P = re.escape(prefix)

    def conv(x):
        return np.transpose(x, (2, 3, 1, 0))

    bn_leaf = {"weight": ("p", "scale"), "bias": ("p", "bias"),
               "running_mean": ("s", "mean"), "running_var": ("s", "var")}

    def bn_path(scope, leaf_key, bn_name):
        kind, leaf = bn_leaf[leaf_key]
        root = params_dest if kind == "p" else stats_dest
        return root + scope + (bn_name, leaf)

    # stem / head (anchored so block-level bn1/bn2 never match)
    yield (rf"^{P}conv_stem\.weight$",
           lambda m: params_dest + ("conv_stem", "kernel"), conv)
    yield (rf"^{P}(bn1|bn2)\.(weight|bias|running_mean|running_var)$",
           lambda m: bn_path((), m.group(2), m.group(1)), None)
    yield (rf"^{P}conv_head\.weight$",
           lambda m: params_dest + ("conv_head", "kernel"), conv)
    # blocks
    blk = rf"^{P}blocks\.(\d+)\.(\d+)\."

    def bscope(m):
        return (f"blocks_{m.group(1)}_{m.group(2)}",)

    yield (blk + r"(conv_pw|conv_dw|conv_pwl)\.weight$",
           lambda m: params_dest + bscope(m) + (m.group(3), "kernel"), conv)
    yield (blk + r"(bn\d)\.(weight|bias|running_mean|running_var)$",
           lambda m: bn_path(bscope(m), m.group(4), m.group(3)), None)
    yield (blk + r"se\.(conv_reduce|conv_expand)\.weight$",
           lambda m: params_dest + bscope(m) + ("se", m.group(3), "kernel"),
           conv)
    yield (blk + r"se\.(conv_reduce|conv_expand)\.bias$",
           lambda m: params_dest + bscope(m) + ("se", m.group(3), "bias"),
           None)


def _projection_entries(torch_prefix: str, dest_name: str, projection: str):
    P = re.escape(torch_prefix)

    def t(x):
        return x.T

    if projection == "simple":
        yield (rf"^{P}\.linear\.weight$", lambda m: ("params", dest_name, "linear", "kernel"), t)
    else:
        for torch_name, tail, cv in [
            ("projection.weight", ("projection", "kernel"), t),
            ("projection.bias", ("projection", "bias"), None),
            ("fc.weight", ("fc", "kernel"), t),
            ("fc.bias", ("fc", "bias"), None),
            ("layer_norm.weight", ("layer_norm", "scale"), None),
            ("layer_norm.bias", ("layer_norm", "bias"), None),
        ]:
            yield (
                rf"^{P}\.{re.escape(torch_name)}$",
                lambda m, tl=tail: ("params", dest_name) + tl,
                cv,
            )


def clip_mapping_table(projection: str = "simple"):
    """The full reference-CLIPModel -> flax-CLIPModel mapping."""
    table = []
    table += list(_vit_entries("image_encoder.model.model.", ("params", "image_encoder")))
    table += list(_resnet_entries(
        "image_encoder.model.model.",
        ("params", "image_encoder"),
        ("batch_stats", "image_encoder"),
    ))
    table += list(_convnext_entries(
        "image_encoder.model.model.", ("params", "image_encoder")))
    table += list(_efficientnet_entries(
        "image_encoder.model.model.",
        ("params", "image_encoder"),
        ("batch_stats", "image_encoder"),
    ))
    # double nesting on BOTH towers: CLIPModel.text_encoder.model is the
    # reference's HuggingFaceModel wrapper and the BERT is its .model
    # submodule (backbones/mml/huggingface_builder.py:6-14), symmetric with
    # image_encoder.model.model (vit_builder.py:8-11).
    table += list(_bert_entries("text_encoder.model.model.", ("params", "text_encoder")))
    table += list(_projection_entries("image_projection", "image_projection", projection))
    table += list(_projection_entries("text_projection", "text_projection", projection))
    table.append((r"^loss\.temperature$", lambda m: ("params", "temperature"), None))
    return table


# --------------------------------------------------------------------------
# conversion driver
# --------------------------------------------------------------------------

def _tree_paths(tree, prefix=()):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _tree_paths(v, prefix + (k,))
    else:
        yield prefix, tree


def _set_path(tree, path, value):
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    node[path[-1]] = value


def torch_to_flax(
    state: Dict[str, np.ndarray],
    params,
    mapping_table,
    interpolate_pe: bool = True,
    strict: bool = False,
):
    """Map a flat torch state dict onto an existing flax param tree.

    Returns (new_params, report) where report lists matched /
    shape-mismatched / missing / unexpected keys (parity:
    utils/checkpoint_utils.filter_state's four buckets).
    """
    import jax

    target = {p: v for p, v in _tree_paths(params)}
    new_flat: Dict[tuple, np.ndarray] = {}
    matched, mismatched, unexpected = [], [], []

    for name, value in state.items():
        hit = None
        for pattern, path_fn, cv in mapping_table:
            m = re.match(pattern, name)
            if m:
                hit = (path_fn(m), cv)
                break
        if hit is None:
            unexpected.append(name)
            continue
        path, cv = hit
        if path not in target:
            unexpected.append(name)
            continue
        arr = cv(value) if cv is not None else value
        want = target[path]
        if path[-1] == "pos_embed" and arr.shape != want.shape and interpolate_pe:
            num_extra = want.shape[1] - int(round((want.shape[1] - 1) ** 0.5)) ** 2
            arr = np.asarray(
                interpolate_pos_embed(arr, want.shape[1] - num_extra, num_extra)
            )
            logger.info(
                f"Interpolated pos_embed {value.shape} -> {arr.shape} "
                f"(parity: interpolate_pe.py)"
            )
        if tuple(arr.shape) != tuple(np.shape(want)):
            mismatched.append((name, arr.shape, tuple(np.shape(want))))
            continue
        # read .dtype directly — np.asarray(want) would pull a
        # device-resident template leaf to the host just to ask its dtype
        new_flat[path] = arr.astype(want.dtype) if hasattr(want, "dtype") else arr
        matched.append(name)

    missing = [p for p in target if p not in new_flat]
    report = {
        "matched": matched,
        "mismatched": mismatched,
        "missing": missing,
        "unexpected": unexpected,
    }
    if strict and (missing or mismatched):
        raise ValueError(f"strict load failed: {report}")

    out: dict = {}
    for path, value in target.items():
        _set_path(out, path, new_flat.get(path, value))
    out = jax.tree.map(lambda x: x, out)  # canonicalize
    logger.info(
        f"torch->flax: {len(matched)} matched, {len(mismatched)} shape-mismatched, "
        f"{len(missing)} missing, {len(unexpected)} unexpected"
    )
    return out, report


def load_clip_checkpoint(
    path: str,
    params,
    projection: str = "simple",
    prefix_rules: Optional[List[str]] = None,
    only_image_encoder: bool = False,
    only_text_encoder: bool = False,
    strict: bool = False,
):
    """One-call loader for reference SimSeg checkpoints
    (parity: tasks/clip/hooks/checkpoint.py external resume incl.
    only_load_{image,text}_encoder filters)."""
    state = load_torch_state_dict(path)
    if prefix_rules:
        state = convert_keys(state, prefix_rules)
    # NOTE: despite the knob names, the filters keep the matching
    # PROJECTION head too ('image_' also matches image_projection.*) —
    # deliberate reference parity: the reference filter is the substring
    # test `'image' in attr` (tasks/clip/hooks/checkpoint.py:86-98), which
    # likewise carries image_projection along with the encoder.
    if only_image_encoder:
        state = {k: v for k, v in state.items() if k.startswith("image_")}
    if only_text_encoder:
        state = {k: v for k, v in state.items() if k.startswith("text_")}
    if only_image_encoder or only_text_encoder:
        # a tower filter necessarily leaves the other tower 'missing';
        # the reference likewise drops to strict=False for these modes
        # (tasks/clip/hooks/checkpoint.py:46-53)
        strict = False
    return torch_to_flax(state, params, clip_mapping_table(projection), strict=strict)
