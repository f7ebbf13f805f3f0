"""Serving export: AOT-serializable inference graphs (jax.export).

Beyond the reference (whose "serving" surface is the two eval scripts,
tools/seg_evaluation.py / tools/retrieval_evaluation.py): the complete
zero-shot segmentation pipeline (device-side normalize -> ViT forward ->
projections -> similarity decode -> CRF -> morphology -> argmax) or the
retrieval embedding forward is staged into one StableHLO artifact with the
weights and the class-text bank baked in as constants. The artifact is
self-contained: a server deserializes it and calls it with raw uint8
images — no model code, config tree, normalization constants, or
checkpoint bridge needed at serving time. The seg pipeline is the SAME
``make_seg_predict`` the mIoU-validated eval tool runs (including
``cfg.seg_eval`` multi-scale / sliding-window / CRF knobs), so served
predictions match ``tools/seg_evaluation.py`` bit-for-bit.

Shapes are static per artifact (batch x H x W), matching XLA's compilation
model — export one artifact per serving batch size.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export

from simseg_tpu.ops.pooling import l2_normalize


def make_seg_infer_fn(model, params, text_bank: jnp.ndarray, cfg,
                      num_classes: int, top_cls_num: int,
                      patch_size: int = 16,
                      bake_weights: bool = True) -> Callable:
    """raw uint8 images (B, S, S, 3) -> (pred, conf).

    The full on-device pipeline of tools/seg_evaluation.py — exactly
    ``tasks/seg_eval.py make_seg_predict`` with weights and the (L2-normed)
    text bank closed over, so every ``cfg.seg_eval`` knob the evaluated
    pipeline honors (scales, window, bilateral_stride, crf_backend) is
    baked into the export.

    bake_weights=False: the returned fn takes ``(params, raw_images)`` so
    the export stages weights as *arguments* instead of constants — for
    the separate-weights artifact layout (see export_artifact_separate)."""
    from simseg_tpu.tasks.seg_eval import make_seg_predict

    predict = make_seg_predict(model, cfg, num_classes=num_classes,
                               top_cls_num=top_cls_num,
                               patch_size=patch_size)
    bank = l2_normalize(jnp.asarray(text_bank, jnp.float32))

    if not bake_weights:
        return lambda p, raw_images: predict(p, raw_images, bank)

    def infer(raw_images: jnp.ndarray):
        return predict(params, raw_images, bank)

    return infer


def make_embed_fn(model, params, cfg=None,
                  bake_weights: bool = True) -> Callable:
    """(raw uint8 images, input_ids, attention_mask) -> (image_emb,
    text_emb) — the retrieval forward with device-side normalization baked
    in (the same graph tools/retrieval_evaluation.py evaluates). With
    cfg=None the images are taken pre-normalized f32 (library use).
    bake_weights=False: fn takes ``(params, images, ids, mask)`` for the
    separate-weights layout."""
    if cfg is not None:
        from simseg_tpu.data.transforms import normalize_images

        mean = tuple(cfg.transforms.normalize.mean)
        std = tuple(cfg.transforms.normalize.std)

    def embed_with(p, images, input_ids, attention_mask):
        if cfg is not None:
            images = normalize_images(images, mean, std)
        img, txt, _ = model.apply(
            p,
            {"image": images, "input_ids": input_ids,
             "attention_mask": attention_mask},
            deterministic=True,
        )
        return img.astype(jnp.float32), txt.astype(jnp.float32)

    if not bake_weights:
        return embed_with
    return lambda images, input_ids, attention_mask: embed_with(
        params, images, input_ids, attention_mask)


def export_artifact(fn: Callable, example_args: Sequence,
                    platforms: Optional[Sequence[str]] = None) -> bytes:
    """Stage ``fn`` at the example shapes and serialize to StableHLO bytes.

    platforms: lowering targets (default: the current backend). Pass
    ('tpu',) to produce a TPU artifact from a CPU host."""
    def spec_of(x):
        # read shape/dtype without touching the data: jnp.asarray here
        # would device-transfer every leaf (the full parameter tree in the
        # separate-weights path) just to read a dtype
        if hasattr(x, "shape") and hasattr(x, "dtype"):
            return jax.ShapeDtypeStruct(x.shape, x.dtype)
        a = np.asarray(x)
        return jax.ShapeDtypeStruct(a.shape, a.dtype)

    specs = tuple(jax.tree.map(spec_of, a) for a in example_args)
    exp = jax_export.export(jax.jit(fn),
                            platforms=tuple(platforms) if platforms else None)(
        *specs)
    return exp.serialize()


def save_artifact(path: str, data: bytes) -> None:
    with open(path, "wb") as f:
        f.write(data)


def _shard_over_mesh(exp, mesh, replicate_first: bool = False) -> Callable:
    """Wrap ``exp.call`` in a jit that partitions it over ``mesh``.

    Artifacts are exported single-program (nr_devices=1); when the exported
    module is called inside an outer jit its StableHLO inlines into the
    outer module, so GSPMD can partition it like any other computation.
    Every input and output is sharded along its LEADING (batch) axis over
    the mesh's first axis name — pure data parallelism; these graphs have
    no cross-sample reductions, so each sample's result is the same math as
    the single-device call. (Bitwise equality is NOT guaranteed: XLA may
    tile a reduction differently at the per-shard shape — integer outputs
    like the seg pred match exactly, float embeddings to ~1e-6.) With
    ``replicate_first`` the first positional argument (the separate-layout
    weight pytree) is replicated instead.
    """
    from jax.sharding import NamedSharding, PartitionSpec

    axis = mesh.axis_names[0]
    n = mesh.shape[axis]
    data_sh = NamedSharding(mesh, PartitionSpec(axis))
    repl_sh = NamedSharding(mesh, PartitionSpec())

    idx = list(range(len(exp.in_avals)))
    args, kwargs = jax.tree.unflatten(exp.in_tree, idx)
    assert not kwargs, "artifacts are exported with positional args only"
    first = set(jax.tree.leaves(args[0])) if (replicate_first and args) else set()
    flat_in = []
    for i, aval in zip(idx, exp.in_avals):
        if i in first:
            flat_in.append(repl_sh)
            continue
        if not aval.shape or aval.shape[0] % n:
            raise ValueError(
                f"artifact input {aval.shape} cannot be batch-sharded over "
                f"{n} devices (leading dim must be divisible); export with a "
                f"divisible batch or serve on fewer chips")
        flat_in.append(data_sh)
    in_shardings, _ = jax.tree.unflatten(exp.in_tree, flat_in)
    flat_out = [data_sh if (a.shape and a.shape[0] % n == 0) else repl_sh
                for a in exp.out_avals]
    out_shardings = jax.tree.unflatten(exp.out_tree, flat_out)
    return jax.jit(exp.call, in_shardings=in_shardings,
                   out_shardings=out_shardings)


def load_artifact(path: str, mesh=None) -> Callable:
    """Deserialize an exported artifact into a callable.

    The call is wrapped in ``jax.jit`` so repeat invocations hit the
    compiled-executable cache — a bare ``Exported.call`` re-traces on every
    invocation (measured ~400x slower in steady state).

    mesh: optional ``jax.sharding.Mesh`` — serve the SAME single-program
    artifact data-parallel over multiple chips: the batch is sharded over
    the mesh's first axis and each chip runs its slice (same per-sample
    math as single-device; the artifact's static batch must be divisible
    by the axis size). No re-export needed."""
    with open(path, "rb") as f:
        exp = jax_export.deserialize(f.read())
    if mesh is not None:
        return _shard_over_mesh(exp, mesh)
    return jax.jit(exp.call)


def export_artifact_separate(fn: Callable, params, example_args: Sequence,
                             path: str,
                             platforms: Optional[Sequence[str]] = None) -> None:
    """Separate-weights layout: ``fn(params, *data)`` is staged with the
    parameters as *arguments* (not constants) and written to ``path``, with
    the weight pytree serialized alongside as ``<path>.weights`` (flax
    msgpack). Compared to the baked layout the graph stays a few MB (the
    compile payload matters behind size-capped relays) and weights rotate
    by replacing one file — no re-export. ``load_artifact_separate`` binds
    them back together."""
    from flax import serialization

    host_params = jax.device_get(params)
    save_artifact(path, export_artifact(fn, (host_params,) + tuple(example_args),
                                        platforms=platforms))
    with open(path + ".weights", "wb") as f:
        f.write(serialization.to_bytes(host_params))


def load_artifact_separate(path: str, mesh=None) -> Callable:
    """Load a separate-weights artifact: returns a data-only callable with
    the weights from ``<path>.weights`` bound as the first argument. The
    weights are committed to the default device once at load time — binding
    host arrays instead would re-transfer the full parameter set on every
    call.

    mesh: optional ``jax.sharding.Mesh`` for data-parallel multi-chip
    serving (see ``load_artifact``); the weight pytree is replicated across
    the mesh at load time, the data arguments are batch-sharded."""
    from flax import serialization

    with open(path, "rb") as f:
        exp = jax_export.deserialize(f.read())
    with open(path + ".weights", "rb") as f:
        params = serialization.msgpack_restore(f.read())
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        call = _shard_over_mesh(exp, mesh, replicate_first=True)
        params = jax.device_put(
            params, NamedSharding(mesh, PartitionSpec()))
    else:
        call = jax.jit(exp.call)
        params = jax.device_put(params)
    return lambda *args: call(params, *args)
