"""ConvNeXt image encoder (CNN backbone path).

Parity: reference ``simseg/models/backbones/mml/timm_builder.py:7-20``
instantiates ANY timm tag with ``num_classes=0`` (head fc = Identity) and
the CNN call path passes ``global_pool=''`` (pipelines/clip.py:191-194), so
a ConvNeXt tag yields the un-pooled spatial feature map with the head's
final LayerNorm applied channelwise (timm 0.6.13 ConvNeXt.forward_head with
identity pooling). Layout and naming match timm's ConvNeXt so reference
torch checkpoints bridge directly (checkpoint/torch_bridge.py
``_convnext_entries``).

Architecture (Liu et al., "A ConvNet for the 2020s"):
- stem: 4x4/4 conv + LayerNorm
- 4 stages of blocks; between stages a LayerNorm + 2x2/2 conv downsample
- block: 7x7 depthwise conv -> LayerNorm -> Linear 4x -> GELU(exact) ->
  Linear -> layer-scale gamma -> residual

TPU notes: the depthwise 7x7 is a grouped conv XLA lowers well; the two
Linears are the FLOPs and ride the MXU in the module dtype (bf16 under
``dist.bf16``); LayerNorm/GELU fuse into them. Channels-last (NHWC)
throughout — the native TPU conv layout.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp


class ConvNeXtBlock(nn.Module):
    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = nn.Conv(self.dim, (7, 7), padding=((3, 3), (3, 3)),
                    feature_group_count=self.dim, dtype=self.dtype,
                    name="conv_dw")(x)
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(h)
        h = nn.Dense(4 * self.dim, dtype=self.dtype, name="fc1")(h)
        # torch nn.GELU default = exact erf form
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.dim, dtype=self.dtype, name="fc2")(h)
        gamma = self.param("gamma", nn.initializers.constant(1e-6),
                           (self.dim,), jnp.float32)
        return x + gamma.astype(self.dtype) * h


class ConvNeXt(nn.Module):
    """Returns the (B, H/32, W/32, C) spatial feature map (timm
    ``num_classes=0, global_pool=''`` semantics, head LayerNorm included)."""

    depths: Sequence[int] = (3, 3, 9, 3)
    dims: Sequence[int] = (96, 192, 384, 768)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images: jnp.ndarray, deterministic: bool = True,
                 train_bn: bool = False) -> jnp.ndarray:
        # train_bn accepted for CNN-path signature compatibility (no BN here)
        del deterministic, train_bn
        x = images.astype(self.dtype)
        x = nn.Conv(self.dims[0], (4, 4), strides=(4, 4), dtype=self.dtype,
                    name="stem_conv")(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="stem_norm")(x)
        for i, (depth, dim) in enumerate(zip(self.depths, self.dims)):
            if i > 0:
                x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                                 name=f"downsample_norm{i}")(x)
                x = nn.Conv(dim, (2, 2), strides=(2, 2), dtype=self.dtype,
                            name=f"downsample_conv{i}")(x)
            for j in range(depth):
                x = ConvNeXtBlock(dim, dtype=self.dtype,
                                  name=f"stage{i}_block{j}")(x)
        # head.norm with identity pooling: channelwise LayerNorm on the map
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="head_norm")(x)
        return x  # (B, h, w, C)


# timm 0.6.13 size table; tags like convnext_tiny_in22k / convnext_tiny.*
# resolve by the size word after the family prefix
_CONVNEXT_SIZES = {
    "atto": dict(depths=(2, 2, 6, 2), dims=(40, 80, 160, 320)),
    "femto": dict(depths=(2, 2, 6, 2), dims=(48, 96, 192, 384)),
    "pico": dict(depths=(2, 2, 6, 2), dims=(64, 128, 256, 512)),
    "nano": dict(depths=(2, 2, 8, 2), dims=(80, 160, 320, 640)),
    "tiny": dict(depths=(3, 3, 9, 3), dims=(96, 192, 384, 768)),
    "small": dict(depths=(3, 3, 27, 3), dims=(96, 192, 384, 768)),
    "base": dict(depths=(3, 3, 27, 3), dims=(128, 256, 512, 1024)),
    "large": dict(depths=(3, 3, 27, 3), dims=(192, 384, 768, 1536)),
    "xlarge": dict(depths=(3, 3, 27, 3), dims=(256, 512, 1024, 2048)),
}

CONVNEXT_CONFIGS = {
    "convnext_test": dict(depths=(1, 1), dims=(8, 16)),
}


def resolve_convnext_config(tag: str):
    """convnext_<size>[_*][.weights] -> spec, or None if not a ConvNeXt tag."""
    if tag in CONVNEXT_CONFIGS:
        return dict(CONVNEXT_CONFIGS[tag])
    parts = tag.split(".")[0].split("_")
    if parts[0] != "convnext" or len(parts) < 2:
        return None
    spec = _CONVNEXT_SIZES.get(parts[1])
    return dict(spec) if spec else None


def build_convnext(tag: str, dtype: jnp.dtype = jnp.float32,
                   arch=None) -> ConvNeXt:
    spec = resolve_convnext_config(tag) or {}
    if arch:
        spec.update({k: v for k, v in dict(arch).items() if v is not None})
    if "dims" not in spec:
        raise KeyError(
            f"Unknown ConvNeXt tag '{tag}'. Known sizes: "
            f"{sorted(_CONVNEXT_SIZES)}; or declare "
            "model.image_encoder.arch={'depths': ..., 'dims': ...}."
        )
    spec["depths"] = tuple(spec["depths"])
    spec["dims"] = tuple(spec["dims"])
    return ConvNeXt(dtype=dtype, **spec)
