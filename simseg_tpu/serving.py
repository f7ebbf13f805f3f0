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
                      patch_size: int = 16) -> Callable:
    """raw uint8 images (B, S, S, 3) -> (pred, conf).

    The full on-device pipeline of tools/seg_evaluation.py — exactly
    ``tasks/seg_eval.py make_seg_predict`` with weights and the (L2-normed)
    text bank closed over, so every ``cfg.seg_eval`` knob the evaluated
    pipeline honors (scales, window, bilateral_stride, crf_backend) is
    baked into the export."""
    from simseg_tpu.tasks.seg_eval import make_seg_predict

    predict = make_seg_predict(model, cfg, num_classes=num_classes,
                               top_cls_num=top_cls_num,
                               patch_size=patch_size)
    bank = l2_normalize(jnp.asarray(text_bank, jnp.float32))

    def infer(raw_images: jnp.ndarray):
        return predict(params, raw_images, bank)

    return infer


def make_embed_fn(model, params, cfg=None) -> Callable:
    """(raw uint8 images, input_ids, attention_mask) -> (image_emb,
    text_emb) — the retrieval forward with device-side normalization baked
    in (the same graph tools/retrieval_evaluation.py evaluates). With
    cfg=None the images are taken pre-normalized f32 (library use)."""
    if cfg is not None:
        from simseg_tpu.data.transforms import normalize_images

        mean = tuple(cfg.transforms.normalize.mean)
        std = tuple(cfg.transforms.normalize.std)

    def embed(images, input_ids, attention_mask):
        if cfg is not None:
            images = normalize_images(images, mean, std)
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
