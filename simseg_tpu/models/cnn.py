"""CNN backbone dispatch by timm tag family.

Parity: reference ``simseg/models/backbones/mml/timm_builder.py:7-20``
resolves ANY timm tag through timm itself; this framework implements the
major CNN families natively (ResNet, ConvNeXt, EfficientNet) and refuses
unknown families loudly (resnet.py's KeyError names the supported surface).

Arbitrary shapes without a known tag ride ``model.image_encoder.arch``; the
family is inferred from the arch's shape keys (``layers`` -> ResNet,
``dims`` -> ConvNeXt, ``stages`` -> EfficientNet).
"""

from __future__ import annotations

import jax.numpy as jnp

from simseg_tpu.models.convnext import build_convnext, resolve_convnext_config
from simseg_tpu.models.efficientnet import (
    build_efficientnet,
    resolve_efficientnet_config,
)
from simseg_tpu.models.resnet import build_resnet


def build_cnn(tag: str, dtype: jnp.dtype = jnp.float32, arch=None):
    arch = dict(arch) if arch else {}
    if resolve_convnext_config(tag) is not None or "dims" in arch:
        return build_convnext(tag, dtype, arch=arch)
    if resolve_efficientnet_config(tag) is not None or "stages" in arch:
        return build_efficientnet(tag, dtype, arch=arch)
    return build_resnet(tag, dtype, arch=arch)
