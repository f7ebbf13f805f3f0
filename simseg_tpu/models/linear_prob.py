"""Linear probing pipeline: frozen image encoder + linear classifier.

Parity: reference ``simseg/models/pipelines/linear_prob.py:11-104`` — ViT
backbone (optionally CLS-token-only features), Linear classifier, CE loss;
``trainable=False`` freezes the encoder (here a ``stop_gradient`` on the
features — with optax the frozen subtree also gets a zero lr mask via
``encoder_frozen_labels``).
"""

from __future__ import annotations

from typing import Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from simseg_tpu.models.clip import PIPELINE
from simseg_tpu.models.vit import build_vit
from simseg_tpu.ops.losses import label_smoothing_ce, soft_target_ce


class LinearProbModel(nn.Module):
    image_tag: str = "vit_base_patch16_224_in21k"
    img_size: int = 224
    num_classes: int = 1000
    only_cls_token: bool = True
    encoder_trainable: bool = False
    dtype: jnp.dtype = jnp.float32
    # model.image_encoder.arch overrides (same surface as CLIPModel: YAML
    # architectures, tome_r, quant, moe_experts). Sorted-tuple form so the
    # module stays hashable.
    image_arch: tuple = ()

    def setup(self) -> None:
        if "vit" in self.image_tag:
            self.image_encoder = build_vit(self.image_tag, self.img_size,
                                           self.dtype,
                                           arch=dict(self.image_arch or ()))
        else:
            # CNN path: global_pool='avg' semantics
            # (parity: linear_prob.py:84-88). ViT-only arch knobs (tome_r,
            # quant, moe_experts) don't exist on the CNN builders, which
            # refuse unknown keys via their constructors.
            from simseg_tpu.models.cnn import build_cnn

            self.image_encoder = build_cnn(self.image_tag, self.dtype,
                                           arch=dict(self.image_arch or ()))
        self.classifier = nn.Dense(self.num_classes, dtype=self.dtype,
                                   name="classifier")

    def forward_image_feature(self, images: jnp.ndarray,
                              deterministic: bool = True) -> jnp.ndarray:
        feats = self.image_encoder(images, deterministic)
        if not self.encoder_trainable:
            feats = jax.lax.stop_gradient(feats)
        if feats.ndim == 4:  # CNN map -> global average pool
            return jnp.mean(feats, axis=(1, 2))
        if self.only_cls_token:
            feats = feats[:, 0]
        else:
            feats = jnp.mean(feats[:, 1:], axis=1)
        return feats

    def __call__(self, batch: Dict[str, jnp.ndarray],
                 deterministic: bool = True) -> jnp.ndarray:
        feats = self.forward_image_feature(batch["image"], deterministic)
        return self.classifier(feats).astype(jnp.float32)


def linear_prob_loss_fn(
    model, params, batch, rng=None, smoothing: float = 0.0,
    soft_targets: bool = False,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """CE loss + top-1/5 accuracy (parity: linear_prob.py:56-70)."""
    rngs = {"dropout": rng} if rng is not None else None
    logits = model.apply(params, batch, deterministic=rng is None, rngs=rngs)
    labels = batch["label"]
    if soft_targets and labels.ndim == 2:
        loss = jnp.mean(soft_target_ce(logits, labels))
        hard = jnp.argmax(labels, axis=-1)
    else:
        loss = jnp.mean(label_smoothing_ce(logits, labels, smoothing))
        hard = labels
    _, top5 = jax.lax.top_k(logits, min(5, logits.shape[-1]))
    match = top5 == hard[:, None]
    acc1 = jnp.mean(match[:, 0].astype(jnp.float32))
    acc5 = jnp.mean(jnp.any(match, axis=1).astype(jnp.float32))
    return loss, {"loss": loss, "acc1": acc1, "acc5": acc5}


def build_linear_prob_model(cfg, dtype=None) -> LinearProbModel:
    if dtype is None:
        dtype = jnp.bfloat16 if cfg.dist.get("bf16", False) else jnp.float32
    arch = dict(cfg.model.image_encoder.get("arch", {}) or {})
    trainable = cfg.model.image_encoder.trainable
    if trainable and arch.get("quant", "none") not in (None, "", "none"):
        # a FROZEN quantized backbone is the classic PTQ probe (the head's
        # gradient never differentiates through round()); a trainable one
        # would silently train to nothing (cf. core/runner.py guard)
        raise NotImplementedError(
            "arch quant is inference-only: set "
            "model.image_encoder.trainable=false for a quantized probe")
    if trainable and int(arch.get("moe_experts", 0) or 0) > 0:
        # the linear-probe loss has no MoE aux term; training the experts
        # without the balancing objective collapses routing — refuse
        # rather than silently drop the aux loss (cf. engine/train_step.py)
        raise NotImplementedError(
            "linear probing does not train MoE towers (no aux balancing "
            "loss here) — freeze the encoder or use the clip task")
    return LinearProbModel(
        image_tag=cfg.model.image_encoder.tag,
        img_size=cfg.transforms.input_size,
        num_classes=cfg.model.classifier.num_classes,
        only_cls_token=cfg.model.image_encoder.vit.get("only_cls_token", True),
        encoder_trainable=trainable,
        dtype=dtype,
        image_arch=tuple(sorted((k, v) for k, v in arch.items()
                                if v is not None)),
    )


@PIPELINE.register(name="linear_prob")
def _linear_prob_pipeline(cfg, **kwargs):
    return build_linear_prob_model(cfg, **kwargs)
