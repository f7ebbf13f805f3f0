"""ResNet image encoder (CNN backbone path).

Parity: reference ``simseg/models/backbones/mml/timm_builder.py:7-20``
(timm CNN backbones with ``global_pool=''`` returning the spatial feature
map) and the CNN handling in CLIPModel (``pipelines/clip.py:79-82`` NCHW ->
(N, HW, C) token reshape; ``:51-62`` freeze_cnn_bn). Layout matches
torchvision/timm ResNet-50 so torch checkpoints bridge directly.

BatchNorm on TPU: under pjit the batch dim is globally sharded, so batch
statistics are computed over the global batch automatically — the
reference's SyncBN conversion (``tasks/clip/train.py:50-56``) is the default
behavior, not an opt-in. With ``train_bn=True`` the forward uses batch
statistics and mutates the ``batch_stats`` collection (the train step merges
it back — reference ``freeze_cnn_bn=False`` semantics, pipelines/clip.py:
51-62); with ``train_bn=False`` running averages are used (freeze mode).
Scale/bias remain trainable either way.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train_bn: bool = False) -> jnp.ndarray:
        def bn(name):
            return nn.BatchNorm(use_running_average=not train_bn,
                                epsilon=1e-5, momentum=0.9, dtype=self.dtype,
                                name=name)

        identity = x
        out = nn.Conv(self.planes, (1, 1), use_bias=False, dtype=self.dtype,
                      name="conv1")(x)
        out = nn.relu(bn("bn1")(out))
        out = nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride),
                      padding=((1, 1), (1, 1)), use_bias=False,
                      dtype=self.dtype, name="conv2")(out)
        out = nn.relu(bn("bn2")(out))
        out = nn.Conv(self.planes * 4, (1, 1), use_bias=False,
                      dtype=self.dtype, name="conv3")(out)
        out = bn("bn3")(out)
        if self.downsample:
            identity = nn.Conv(self.planes * 4, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype,
                               name="downsample_conv")(x)
            identity = nn.BatchNorm(use_running_average=not train_bn,
                                    epsilon=1e-5, momentum=0.9,
                                    dtype=self.dtype,
                                    name="downsample_bn")(identity)
        return nn.relu(out + identity)


class BasicBlock(nn.Module):
    """torchvision/timm BasicBlock (resnet18/34): two 3x3 convs, expansion 1."""

    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train_bn: bool = False) -> jnp.ndarray:
        def bn(name):
            return nn.BatchNorm(use_running_average=not train_bn,
                                epsilon=1e-5, momentum=0.9, dtype=self.dtype,
                                name=name)

        identity = x
        out = nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride),
                      padding=((1, 1), (1, 1)), use_bias=False,
                      dtype=self.dtype, name="conv1")(x)
        out = nn.relu(bn("bn1")(out))
        out = nn.Conv(self.planes, (3, 3), padding=((1, 1), (1, 1)),
                      use_bias=False, dtype=self.dtype, name="conv2")(out)
        out = bn("bn2")(out)
        if self.downsample:
            identity = nn.Conv(self.planes, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype,
                               name="downsample_conv")(x)
            identity = nn.BatchNorm(use_running_average=not train_bn,
                                    epsilon=1e-5, momentum=0.9,
                                    dtype=self.dtype,
                                    name="downsample_bn")(identity)
        return nn.relu(out + identity)


class ResNet(nn.Module):
    """Returns the (B, H/32, W/32, C) spatial feature map
    (timm ``global_pool=''`` semantics)."""

    layers: Sequence[int] = (3, 4, 6, 3)
    width: int = 64
    block: str = "bottleneck"  # bottleneck (50/101/152) | basic (18/34)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images: jnp.ndarray, deterministic: bool = True,
                 train_bn: bool = False) -> jnp.ndarray:
        x = images.astype(self.dtype)
        x = nn.Conv(self.width, (7, 7), strides=(2, 2),
                    padding=((3, 3), (3, 3)), use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train_bn, epsilon=1e-5,
                         momentum=0.9, dtype=self.dtype, name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        planes = self.width
        basic = self.block == "basic"
        for stage, blocks in enumerate(self.layers):
            stride = 1 if stage == 0 else 2
            for i in range(blocks):
                # bottleneck stage-0 block-0 changes channels (C -> 4C) so it
                # always downsamples; basic blocks only on strided stages
                down = (i == 0 and stage > 0) if basic else (i == 0)
                cls = BasicBlock if basic else Bottleneck
                x = cls(
                    planes, stride=stride if i == 0 else 1,
                    downsample=down, dtype=self.dtype,
                    name=f"layer{stage + 1}_{i}",
                )(x, train_bn)
            planes *= 2
        return x  # (B, h, w, C)


# tag tables (weight-suffix tolerant via tag.split('.')); arbitrary
# architectures can be declared via model.image_encoder.arch
# (layers / width / block)
RESNET_CONFIGS = {
    "resnet_test": dict(layers=(1, 1), width=8),
    "resnet_basic_test": dict(layers=(1, 1), width=8, block="basic"),
}

_RESNET_FAMILY = {
    "resnet18": dict(layers=(2, 2, 2, 2), width=64, block="basic"),
    "resnet34": dict(layers=(3, 4, 6, 3), width=64, block="basic"),
    "resnet50": dict(layers=(3, 4, 6, 3), width=64),
    "resnet101": dict(layers=(3, 4, 23, 3), width=64),
    "resnet152": dict(layers=(3, 8, 36, 3), width=64),
}


def build_resnet(tag: str, dtype: jnp.dtype = jnp.float32,
                 arch=None) -> ResNet:
    spec = RESNET_CONFIGS.get(tag) or _RESNET_FAMILY.get(tag.split(".")[0])
    spec = dict(spec) if spec else {}
    if arch:
        spec.update({k: v for k, v in dict(arch).items() if v is not None})
    if "layers" not in spec:
        # the reference's timm_builder.py:7-20 instantiates ANY timm tag;
        # this framework's CNN surface is the ResNet / ConvNeXt /
        # EfficientNet families (+ arbitrary shapes via arch) — other CNN
        # families refuse loudly here rather than mis-building
        raise KeyError(
            f"Unknown CNN tag '{tag}'. Supported image towers: any standard "
            f"timm ViT tag (pattern-parsed, models/vit.py), the ResNet "
            f"family {sorted(RESNET_CONFIGS) + sorted(_RESNET_FAMILY)}, "
            "convnext_<size> (models/convnext.py), efficientnet_b0..b7 "
            "(models/efficientnet.py), or an arbitrary shape declared via "
            "model.image_encoder.arch (ResNet: layers/width/block; "
            "ConvNeXt: depths/dims; EfficientNet: stages/stem_chs/"
            "head_chs). Other timm CNN families are not implemented."
        )
    spec["layers"] = tuple(spec["layers"])
    return ResNet(dtype=dtype, **spec)
