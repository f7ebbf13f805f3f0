"""Host-side image transforms (PIL) + device-side normalization.

Parity: reference ``simseg/transforms/mml/transforms.py:12-93`` — the same
registered op names (resize, resize_bicubic, center_crop, random_crop,
random_flip, autoaug, random_resize_crop, random_erasing, color_distortion,
gaussian_blur, color_jitter) composed from ``cfg.transforms``, with ToTensor
+ Normalize appended by ``build_transforms``. AutoAugment is the standard
ImageNet policy (24 sub-policies) the reference vendors from
DeepVoltaire/AutoAugment (``transforms/mml/auto_augment.py``).

TPU-native split: PIL ops run on the host worker threads; the
0-255 -> float -> mean/std normalization runs on device inside the jitted
step (``normalize_images``), fused by XLA into the first conv — images cross
PCIe as uint8, a 4x transfer saving.
"""

from __future__ import annotations

import random
from typing import Callable, List, Sequence

import numpy as np
from PIL import Image, ImageEnhance, ImageFilter, ImageOps

import jax.numpy as jnp

from simseg_tpu.utils.registry import Registry

TRANSFORMS = Registry("TRANSFORMS")

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


# --------------------------------------------------------------------------
# basic PIL ops
# --------------------------------------------------------------------------

@TRANSFORMS.register
def resize(cfg, **_):
    size = cfg.transforms.resize.size
    return lambda img: img.resize((size, size), Image.BILINEAR)


@TRANSFORMS.register
def resize_bicubic(cfg, **_):
    size = cfg.transforms.resize_bicubic.size

    def fn(img):
        w, h = img.size
        if w < h:
            nw, nh = size, int(round(h * size / w))
        else:
            nw, nh = int(round(w * size / h)), size
        return img.resize((nw, nh), Image.BICUBIC)
    return fn


@TRANSFORMS.register
def center_crop(cfg, **_):
    size = cfg.transforms.center_crop.size

    def fn(img):
        w, h = img.size
        left = int(round((w - size) / 2.0))
        top = int(round((h - size) / 2.0))
        return img.crop((left, top, left + size, top + size))
    return fn


@TRANSFORMS.register
def random_crop(cfg, **_):
    size = cfg.transforms.random_crop.size

    def fn(img):
        w, h = img.size
        if w == size and h == size:
            return img
        left = random.randint(0, max(0, w - size))
        top = random.randint(0, max(0, h - size))
        return img.crop((left, top, left + size, top + size))
    return fn


@TRANSFORMS.register
def random_flip(cfg, **_):
    return lambda img: (
        img.transpose(Image.FLIP_LEFT_RIGHT) if random.random() < 0.5 else img
    )


@TRANSFORMS.register
def random_resize_crop(cfg, **_):
    size = cfg.transforms.random_resize_crop.size
    scale = tuple(cfg.transforms.random_resize_crop.scale)
    ratio = (3.0 / 4.0, 4.0 / 3.0)

    def fn(img):
        w, h = img.size
        area = w * h
        for _ in range(10):
            target = area * random.uniform(*scale)
            logr = random.uniform(np.log(ratio[0]), np.log(ratio[1]))
            ar = float(np.exp(logr))
            cw = int(round((target * ar) ** 0.5))
            ch = int(round((target / ar) ** 0.5))
            if 0 < cw <= w and 0 < ch <= h:
                left = random.randint(0, w - cw)
                top = random.randint(0, h - ch)
                return img.crop((left, top, left + cw, top + ch)).resize(
                    (size, size), Image.BILINEAR
                )
        # fallback: center crop
        inr = w / h
        if inr < ratio[0]:
            cw, ch = w, int(round(w / ratio[0]))
        elif inr > ratio[1]:
            cw, ch = int(round(h * ratio[1])), h
        else:
            cw, ch = w, h
        left, top = (w - cw) // 2, (h - ch) // 2
        return img.crop((left, top, left + cw, top + ch)).resize(
            (size, size), Image.BILINEAR
        )
    return fn


@TRANSFORMS.register
def color_jitter(cfg, **_):
    strength = float(cfg.transforms.color_jitter)

    def fn(img):
        for enh in (ImageEnhance.Brightness, ImageEnhance.Contrast,
                    ImageEnhance.Color):
            factor = 1.0 + random.uniform(-strength, strength)
            img = enh(img).enhance(max(factor, 0.0))
        return img
    return fn


@TRANSFORMS.register
def gaussian_blur(cfg, **_):
    p = cfg.transforms.gaussian_blur.p
    rmin = cfg.transforms.gaussian_blur.radius_min
    rmax = cfg.transforms.gaussian_blur.radius_max

    def fn(img):
        if random.random() < p:
            return img.filter(
                ImageFilter.GaussianBlur(radius=random.uniform(rmin, rmax))
            )
        return img
    return fn


@TRANSFORMS.register
def color_distortion(cfg, **_):
    """SimCLR-style: strong jitter + random grayscale
    (parity: transforms/mml/color_distortion.py)."""
    s = cfg.transforms.color_distortion.strength

    def fn(img):
        if random.random() < 0.8:
            for enh in (ImageEnhance.Brightness, ImageEnhance.Contrast,
                        ImageEnhance.Color):
                img = enh(img).enhance(max(1.0 + random.uniform(-0.8 * s, 0.8 * s), 0.0))
        if random.random() < 0.2:
            img = img.convert("L").convert("RGB")
        return img
    return fn


# --------------------------------------------------------------------------
# AutoAugment ImageNetPolicy (standard public policy)
# --------------------------------------------------------------------------

def _shear_x(img, mag):
    return img.transform(img.size, Image.AFFINE, (1, mag * random.choice([-1, 1]), 0, 0, 1, 0))


def _shear_y(img, mag):
    return img.transform(img.size, Image.AFFINE, (1, 0, 0, mag * random.choice([-1, 1]), 1, 0))


def _translate_x(img, mag):
    return img.transform(
        img.size, Image.AFFINE, (1, 0, mag * img.size[0] * random.choice([-1, 1]), 0, 1, 0)
    )


def _translate_y(img, mag):
    return img.transform(
        img.size, Image.AFFINE, (1, 0, 0, 0, 1, mag * img.size[1] * random.choice([-1, 1]))
    )


def _rotate(img, mag):
    return img.rotate(mag * random.choice([-1, 1]))


_AUG_OPS = {
    "shearX": (_shear_x, np.linspace(0, 0.3, 10)),
    "shearY": (_shear_y, np.linspace(0, 0.3, 10)),
    "translateX": (_translate_x, np.linspace(0, 150 / 331, 10)),
    "translateY": (_translate_y, np.linspace(0, 150 / 331, 10)),
    "rotate": (_rotate, np.linspace(0, 30, 10)),
    "color": (lambda im, m: ImageEnhance.Color(im).enhance(1 + m * random.choice([-1, 1])),
              np.linspace(0.0, 0.9, 10)),
    "posterize": (lambda im, m: ImageOps.posterize(im, int(m)),
                  np.round(np.linspace(8, 4, 10), 0).astype(int)),
    "solarize": (lambda im, m: ImageOps.solarize(im, m), np.linspace(256, 0, 10)),
    "contrast": (lambda im, m: ImageEnhance.Contrast(im).enhance(1 + m * random.choice([-1, 1])),
                 np.linspace(0.0, 0.9, 10)),
    "sharpness": (lambda im, m: ImageEnhance.Sharpness(im).enhance(1 + m * random.choice([-1, 1])),
                  np.linspace(0.0, 0.9, 10)),
    "brightness": (lambda im, m: ImageEnhance.Brightness(im).enhance(1 + m * random.choice([-1, 1])),
                   np.linspace(0.0, 0.9, 10)),
    "autocontrast": (lambda im, m: ImageOps.autocontrast(im), [0] * 10),
    "equalize": (lambda im, m: ImageOps.equalize(im), [0] * 10),
    "invert": (lambda im, m: ImageOps.invert(im), [0] * 10),
}

# (op1, p1, mag1, op2, p2, mag2) — the 24 (policy lists 25 incl. repeat)
# ImageNet sub-policies from the AutoAugment paper.
_IMAGENET_POLICY = [
    ("posterize", 0.4, 8, "rotate", 0.6, 9),
    ("solarize", 0.6, 5, "autocontrast", 0.6, 5),
    ("equalize", 0.8, 8, "equalize", 0.6, 3),
    ("posterize", 0.6, 7, "posterize", 0.6, 6),
    ("equalize", 0.4, 7, "solarize", 0.2, 4),
    ("equalize", 0.4, 4, "rotate", 0.8, 8),
    ("solarize", 0.6, 3, "equalize", 0.6, 7),
    ("posterize", 0.8, 5, "equalize", 1.0, 2),
    ("rotate", 0.2, 3, "solarize", 0.6, 8),
    ("equalize", 0.6, 8, "posterize", 0.4, 6),
    ("rotate", 0.8, 8, "color", 0.4, 0),
    ("rotate", 0.4, 9, "equalize", 0.6, 2),
    ("equalize", 0.0, 7, "equalize", 0.8, 8),
    ("invert", 0.6, 4, "equalize", 1.0, 8),
    ("color", 0.6, 4, "contrast", 1.0, 8),
    ("rotate", 0.8, 8, "color", 1.0, 2),
    ("color", 0.8, 8, "solarize", 0.8, 7),
    ("sharpness", 0.4, 7, "invert", 0.6, 8),
    ("shearX", 0.6, 5, "equalize", 1.0, 9),
    ("color", 0.4, 0, "equalize", 0.6, 3),
    ("equalize", 0.4, 7, "solarize", 0.2, 4),
    ("solarize", 0.6, 5, "autocontrast", 0.6, 5),
    ("invert", 0.6, 4, "equalize", 1.0, 8),
    ("color", 0.6, 4, "contrast", 1.0, 8),
]


class ImageNetPolicy:
    def __call__(self, img: Image.Image) -> Image.Image:
        op1, p1, m1, op2, p2, m2 = random.choice(_IMAGENET_POLICY)
        for op, p, m in ((op1, p1, m1), (op2, p2, m2)):
            if random.random() < p:
                fn, mags = _AUG_OPS[op]
                img = fn(img, mags[m])
        return img


@TRANSFORMS.register
def autoaug(cfg, **_):
    return ImageNetPolicy()


# --------------------------------------------------------------------------
# random erasing (numpy, post-array)
# --------------------------------------------------------------------------

class RandomErasing:
    """timm-style cutout on HWC float arrays
    (parity: transforms/mml/random_erasing.py)."""

    def __init__(self, prob: float, mode: str = "pixel", max_count: int = 1):
        self.prob = prob
        self.mode = mode
        self.max_count = max_count

    def __call__(self, arr: np.ndarray) -> np.ndarray:
        if random.random() >= self.prob:
            return arr
        h, w, c = arr.shape
        count = random.randint(1, self.max_count)
        for _ in range(count):
            for _attempt in range(10):
                area = h * w * random.uniform(0.02, 1 / 3) / count
                ar = np.exp(random.uniform(np.log(0.3), np.log(1 / 0.3)))
                eh, ew = int(round((area * ar) ** 0.5)), int(round((area / ar) ** 0.5))
                if eh < h and ew < w:
                    top, left = random.randint(0, h - eh), random.randint(0, w - ew)
                    if self.mode == "pixel":
                        arr[top:top + eh, left:left + ew] = np.random.normal(
                            size=(eh, ew, c)
                        )
                    else:
                        arr[top:top + eh, left:left + ew] = 0
                    break
        return arr


# --------------------------------------------------------------------------
# composition
# --------------------------------------------------------------------------

class TransformPipeline:
    """Composed cfg-listed PIL ops; callable PIL -> uint8 HWC numpy
    (normalization runs on device — see normalize_images).

    ``from_bytes(data)`` is the loader fast path: when the native decode
    library is available (data/native.py) and the leading geometry op is
    foldable, decode + crop + resample run in C++ (GIL-free, with
    DCT-domain scaled JPEG decode); any remaining PIL-only ops (autoaug,
    color jitter, ...) apply on the small post-crop image. Falls back to
    PIL transparently."""

    def __init__(self, cfg, mode: str):
        names: Sequence[str] = list(
            cfg.transforms.train_transforms if mode == "train"
            else cfg.transforms.valid_transforms
        )
        self.names = names
        self.mode = mode
        self.ops: List[Callable] = [TRANSFORMS.get(n)(cfg) for n in names]
        self.erasing = None
        if cfg.transforms.random_erasing.reprob > 0 and mode == "train":
            re_cfg = cfg.transforms.random_erasing
            self.erasing = RandomErasing(re_cfg.reprob, re_cfg.remode,
                                         re_cfg.recount)
        # DCT-scaled decode loses sub-LSB fidelity; keep eval decodes exact
        self._fast_scale = mode == "train"
        self._head = self._plan_native_head(cfg) if (
            names and cfg.get("data", {}).get("native_decode", True)
        ) else None

    # -- PIL path ----------------------------------------------------------
    def _finish(self, img: Image.Image, start: int = 0) -> np.ndarray:
        for op in self.ops[start:]:
            img = op(img)
        arr = np.asarray(img.convert("RGB"), dtype=np.uint8)
        return self._erase(arr)

    def _erase(self, arr: np.ndarray) -> np.ndarray:
        if self.erasing is not None:
            arr = (self.erasing(arr.astype(np.float32) / 255.0) * 255
                   ).clip(0, 255).astype(np.uint8)
        return arr

    def __call__(self, img: Image.Image) -> np.ndarray:
        return self._finish(img, 0)

    # -- native path -------------------------------------------------------
    def _plan_native_head(self, cfg):
        """Fold the leading geometry op (and an immediately following
        random_flip) into one native decode call. Returns
        fn(data, native) -> ((crop|None), (out_w, out_h)|None, filter,
        n_ops_consumed) or None when the head op is not foldable."""
        head = self.names[0]
        fold_flip = len(self.names) > 1 and self.names[1] == "random_flip"
        t = cfg.transforms

        if head == "resize":
            size = t.resize.size

            def plan(data, native):
                return None, (size, size), native.FILTER_BILINEAR, 1
        elif head == "resize_bicubic":
            size = t.resize_bicubic.size

            def plan(data, native):
                w, h = native.image_size(data)
                if w < h:
                    nw, nh = size, int(round(h * size / w))
                else:
                    nw, nh = int(round(w * size / h)), size
                return None, (nw, nh), native.FILTER_BICUBIC, 1
        elif head == "center_crop":
            size = t.center_crop.size

            def plan(data, native):
                w, h = native.image_size(data)
                if w < size or h < size:
                    # PIL pads out-of-bounds crops with black; the native
                    # decoder would clamp+stretch instead — use PIL
                    return None
                left = int(round((w - size) / 2.0))
                top = int(round((h - size) / 2.0))
                return ((left, top, size, size), (size, size),
                        native.FILTER_BILINEAR, 1)
        elif head == "random_crop":
            size = t.random_crop.size

            def plan(data, native):
                w, h = native.image_size(data)
                if w < size or h < size:
                    return None  # see center_crop: PIL pads, native can't
                if w == size and h == size:
                    # mirror the PIL op's early return WITHOUT touching the
                    # rng, keeping the shared `random` stream aligned
                    # between the PIL and native paths in seeded runs
                    return ((0, 0, size, size), (size, size),
                            native.FILTER_BILINEAR, 1)
                left = random.randint(0, max(0, w - size))
                top = random.randint(0, max(0, h - size))
                return ((left, top, size, size), (size, size),
                        native.FILTER_BILINEAR, 1)
        elif head == "random_resize_crop":
            size = t.random_resize_crop.size
            scale = tuple(t.random_resize_crop.scale)
            ratio = (3.0 / 4.0, 4.0 / 3.0)

            def plan(data, native):
                # identical sampling to the PIL op above (same global rng)
                w, h = native.image_size(data)
                area = w * h
                for _ in range(10):
                    target = area * random.uniform(*scale)
                    logr = random.uniform(np.log(ratio[0]), np.log(ratio[1]))
                    ar = float(np.exp(logr))
                    cw = int(round((target * ar) ** 0.5))
                    ch = int(round((target / ar) ** 0.5))
                    if 0 < cw <= w and 0 < ch <= h:
                        left = random.randint(0, w - cw)
                        top = random.randint(0, h - ch)
                        return ((left, top, cw, ch), (size, size),
                                native.FILTER_BILINEAR, 1)
                inr = w / h
                if inr < ratio[0]:
                    cw, ch = w, int(round(w / ratio[0]))
                elif inr > ratio[1]:
                    cw, ch = int(round(h * ratio[1])), h
                else:
                    cw, ch = w, h
                left = (w - cw) // 2
                top = (h - ch) // 2
                return ((left, top, cw, ch), (size, size),
                        native.FILTER_BILINEAR, 1)
        else:
            return None

        if not fold_flip:
            def plan_noflip(data, native):
                p = plan(data, native)
                return None if p is None else p + (False,)

            return plan_noflip

        def plan_flip(data, native):
            p = plan(data, native)
            if p is None:
                return None
            crop, out, filt, n = p
            return crop, out, filt, n + 1, random.random() < 0.5

        return plan_flip

    def from_bytes(self, data: bytes) -> np.ndarray:
        """Decode raw encoded bytes through the pipeline (native fast path
        when possible, PIL otherwise)."""
        from simseg_tpu.data import native

        if self._head is not None and native.available():
            try:
                planned = self._head(data, native)
                if planned is None:
                    # per-image fallback (e.g. crop larger than the image,
                    # where PIL pads but the native decoder can't)
                    from io import BytesIO

                    return self._finish(
                        Image.open(BytesIO(data)).convert("RGB"), 0)
                crop, out, filt, consumed, flip = planned
                arr = native.decode(data, crop=crop, out_size=out, flip=flip,
                                    filter=filt, fast_scale=self._fast_scale)
            except ValueError:
                # unsupported/corrupt encoding: let PIL try
                from io import BytesIO

                return self._finish(
                    Image.open(BytesIO(data)).convert("RGB"), 0)
            if consumed < len(self.ops):
                return self._finish(Image.fromarray(arr), consumed)
            return self._erase(arr)
        from io import BytesIO

        return self._finish(Image.open(BytesIO(data)).convert("RGB"), 0)

    def load(self, path: str) -> np.ndarray:
        """File -> pipeline (reads bytes once so the native path can sniff
        and decode without PIL)."""
        with open(path, "rb") as f:
            return self.from_bytes(f.read())


def build_transforms(cfg, mode: str = "train") -> TransformPipeline:
    """Compose cfg-listed ops (parity: transforms.py:74-93). Returns a
    TransformPipeline — callable PIL -> uint8 numpy, with ``from_bytes`` /
    ``load`` native fast paths."""
    return TransformPipeline(cfg, mode)


def normalize_images(images_u8: jnp.ndarray,
                     mean: Sequence[float] = IMAGENET_MEAN,
                     std: Sequence[float] = IMAGENET_STD) -> jnp.ndarray:
    """Device-side ToTensor + Normalize, fused by XLA into the first conv.
    images_u8: (B, H, W, 3) uint8 -> normalized float32."""
    x = images_u8.astype(jnp.float32) / 255.0
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)
    return (x - mean) / std


def denormalize_to_u8(images: jnp.ndarray,
                      mean: Sequence[float] = IMAGENET_MEAN,
                      std: Sequence[float] = IMAGENET_STD) -> jnp.ndarray:
    """Inverse of normalize_images (seg eval recovers raw pixels for the CRF,
    parity: seg_evaluation.py:105)."""
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)
    x = jnp.round((images * std + mean) * 255.0)
    return jnp.clip(x, 0, 255).astype(jnp.uint8)
