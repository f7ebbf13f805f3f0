"""EfficientNet image encoder (CNN backbone path).

Parity: reference ``simseg/models/backbones/mml/timm_builder.py:7-20``
(ANY timm tag, ``num_classes=0``) + the CNN call path's ``global_pool=''``
(pipelines/clip.py:191-194): an efficientnet tag yields the un-pooled
(B, C, H/32, W/32) feature map after conv_head+bn2+SiLU (timm
EfficientNet.forward_features). Module/leaf naming mirrors timm 0.6.13's
EfficientNet so reference torch checkpoints bridge directly
(checkpoint/torch_bridge.py ``_efficientnet_entries``). This implements the
plain (non-``tf_``) variants: symmetric conv padding, BN eps 1e-5.

Architecture (Tan & Le): MBConv (inverted residual) stages with SiLU and
squeeze-excitation; SE reduced width = max(1, int(in_chs * 0.25)) computed
from the block's INPUT channels (the original rule, which timm reproduces
to load the TF-ported weights). Width multiplier rounds channels to
multiples of 8 with the +10% guard; depth multiplier rounds repeats up.

TPU notes: channels-last NHWC throughout; the 1x1 expand/project convs are
batched matmuls on the MXU; depthwise convs and SE are bandwidth-light and
XLA fuses the BN+SiLU chains into them. BatchNorm under pjit computes
global-batch statistics (SyncBN semantics by default — see resnet.py).
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp


def round_channels(c: float, divisor: int = 8) -> int:
    """timm round_channels: nearest multiple of 8, never below 90%."""
    new_c = max(divisor, int(c + divisor / 2) // divisor * divisor)
    if new_c < 0.9 * c:
        new_c += divisor
    return int(new_c)


def _bn(name: str, train_bn: bool, dtype):
    return nn.BatchNorm(use_running_average=not train_bn, epsilon=1e-5,
                        momentum=0.9, dtype=dtype, name=name)


class SqueezeExcite(nn.Module):
    rd_chs: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        s = x.mean(axis=(1, 2), keepdims=True)
        s = nn.Conv(self.rd_chs, (1, 1), dtype=self.dtype,
                    name="conv_reduce")(s)
        s = nn.silu(s)
        s = nn.Conv(x.shape[-1], (1, 1), dtype=self.dtype,
                    name="conv_expand")(s)
        return x * nn.sigmoid(s)


class DepthwiseSeparable(nn.Module):
    """timm DepthwiseSeparableConv (stage-0 blocks, expand ratio 1):
    dw conv -> bn1 -> SiLU -> SE -> pw conv -> bn2 (no activation)."""

    out_chs: int
    kernel: int = 3
    stride: int = 1
    se_ratio: float = 0.25
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train_bn: bool = False) -> jnp.ndarray:
        in_chs = x.shape[-1]
        p = self.kernel // 2
        h = nn.Conv(in_chs, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=((p, p), (p, p)), feature_group_count=in_chs,
                    use_bias=False, dtype=self.dtype, name="conv_dw")(x)
        h = nn.silu(_bn("bn1", train_bn, self.dtype)(h))
        h = SqueezeExcite(max(1, int(in_chs * self.se_ratio)),
                          dtype=self.dtype, name="se")(h)
        h = nn.Conv(self.out_chs, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv_pw")(h)
        h = _bn("bn2", train_bn, self.dtype)(h)
        if self.stride == 1 and in_chs == self.out_chs:
            h = h + x
        return h


class InvertedResidual(nn.Module):
    """timm InvertedResidual (MBConv): pw expand -> dw -> SE -> pw project."""

    out_chs: int
    expand: int = 6
    kernel: int = 3
    stride: int = 1
    se_ratio: float = 0.25
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train_bn: bool = False) -> jnp.ndarray:
        in_chs = x.shape[-1]
        mid = in_chs * self.expand
        p = self.kernel // 2
        h = nn.Conv(mid, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv_pw")(x)
        h = nn.silu(_bn("bn1", train_bn, self.dtype)(h))
        h = nn.Conv(mid, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=((p, p), (p, p)), feature_group_count=mid,
                    use_bias=False, dtype=self.dtype, name="conv_dw")(h)
        h = nn.silu(_bn("bn2", train_bn, self.dtype)(h))
        h = SqueezeExcite(max(1, int(in_chs * self.se_ratio)),
                          dtype=self.dtype, name="se")(h)
        h = nn.Conv(self.out_chs, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv_pwl")(h)
        h = _bn("bn3", train_bn, self.dtype)(h)
        if self.stride == 1 and in_chs == self.out_chs:
            h = h + x
        return h


# base (b0) stage table: (expand, channels, repeats, stride, kernel)
_B0_STAGES: Tuple[Tuple[int, int, int, int, int], ...] = (
    (1, 16, 1, 1, 3),
    (6, 24, 2, 2, 3),
    (6, 40, 2, 2, 5),
    (6, 80, 3, 2, 3),
    (6, 112, 3, 1, 5),
    (6, 192, 4, 2, 5),
    (6, 320, 1, 1, 3),
)


class EfficientNet(nn.Module):
    """Returns the (B, H/32, W/32, num_features) spatial feature map (timm
    ``num_classes=0, global_pool=''`` semantics: conv_head+bn2+SiLU applied,
    no pooling)."""

    stages: Sequence[Tuple[int, int, int, int, int]] = _B0_STAGES
    stem_chs: int = 32
    head_chs: int = 1280
    se_ratio: float = 0.25
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images: jnp.ndarray, deterministic: bool = True,
                 train_bn: bool = False) -> jnp.ndarray:
        del deterministic
        x = images.astype(self.dtype)
        x = nn.Conv(self.stem_chs, (3, 3), strides=(2, 2),
                    padding=((1, 1), (1, 1)), use_bias=False,
                    dtype=self.dtype, name="conv_stem")(x)
        x = nn.silu(_bn("bn1", train_bn, self.dtype)(x))
        for s, (expand, chs, repeats, stride, kernel) in enumerate(self.stages):
            for b in range(repeats):
                st = stride if b == 0 else 1
                if expand == 1:
                    x = DepthwiseSeparable(
                        chs, kernel=kernel, stride=st, se_ratio=self.se_ratio,
                        dtype=self.dtype, name=f"blocks_{s}_{b}")(x, train_bn)
                else:
                    x = InvertedResidual(
                        chs, expand=expand, kernel=kernel, stride=st,
                        se_ratio=self.se_ratio, dtype=self.dtype,
                        name=f"blocks_{s}_{b}")(x, train_bn)
        x = nn.Conv(self.head_chs, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv_head")(x)
        x = nn.silu(_bn("bn2", train_bn, self.dtype)(x))
        return x  # (B, h, w, C)


# (width_mult, depth_mult) per variant
_EFFNET_MULTS = {
    "b0": (1.0, 1.0), "b1": (1.0, 1.1), "b2": (1.1, 1.2), "b3": (1.2, 1.4),
    "b4": (1.4, 1.8), "b5": (1.6, 2.2), "b6": (1.8, 2.6), "b7": (2.0, 3.1),
}

EFFICIENTNET_CONFIGS = {
    "efficientnet_test": dict(
        stages=((1, 8, 1, 1, 3), (6, 16, 2, 2, 3)),
        stem_chs=8, head_chs=32),
}


def scaled_stages(width: float, depth: float):
    return tuple(
        (e, round_channels(c * width), int(math.ceil(r * depth)), s, k)
        for e, c, r, s, k in _B0_STAGES
    )


def resolve_efficientnet_config(tag: str):
    """efficientnet_b<N>[.weights] -> spec, or None if not an EfficientNet
    tag this framework resolves (``tf_``/lite/v2 variants differ in padding
    or ops and are refused rather than mis-built)."""
    if tag in EFFICIENTNET_CONFIGS:
        return dict(EFFICIENTNET_CONFIGS[tag])
    parts = tag.split(".")[0].split("_")
    if parts[0] != "efficientnet" or len(parts) != 2:
        return None
    mults = _EFFNET_MULTS.get(parts[1])
    if mults is None:
        return None
    w, d = mults
    return dict(stages=scaled_stages(w, d),
                stem_chs=round_channels(32 * w),
                head_chs=round_channels(1280 * w))


def build_efficientnet(tag: str, dtype: jnp.dtype = jnp.float32,
                       arch=None) -> EfficientNet:
    spec = resolve_efficientnet_config(tag) or {}
    if arch:
        spec.update({k: v for k, v in dict(arch).items() if v is not None})
    if "stages" not in spec:
        raise KeyError(
            f"Unknown EfficientNet tag '{tag}'. Supported: efficientnet_b0.."
            "b7 (plain variants; tf_/lite/v2 differ in padding or ops and "
            "are not implemented), or declare model.image_encoder.arch="
            "{'stages': ..., 'stem_chs': ..., 'head_chs': ...}."
        )
    spec["stages"] = tuple(tuple(s) for s in spec["stages"])
    return EfficientNet(dtype=dtype, **spec)
