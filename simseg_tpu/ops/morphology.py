"""Binary morphology and nearest-neighbor resizing on device.

Parity: reference post-CRF cleanup ``tools/seg_evaluation.py:156-161`` —
``cv2.dilate`` then ``cv2.erode`` with a 7x7 ones kernel, then
``cv2.resize(..., INTER_NEAREST)`` to the ground-truth size. Here dilate and
erode are ``lax.reduce_window`` max/min (cv2 border semantics: dilate pads
with -inf / erode with +inf so borders behave like BORDER_CONSTANT of the
identity element), and nearest resize matches cv2's source-index rule
``src = floor(dst * (in/out))``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _sep_window(x: jnp.ndarray, ksize: int, init, op) -> jnp.ndarray:
    """Separable square max/min filter: a k x k rank filter is two 1-D
    passes (k+k comparisons per pixel instead of k*k)."""
    pad = ksize // 2
    nd = x.ndim

    def pass_along(v, axis):
        dims = [1] * nd
        dims[axis] = ksize
        padding = [(0, 0)] * nd
        padding[axis] = (pad, ksize - 1 - pad)
        return jax.lax.reduce_window(
            v, init, op, tuple(dims), (1,) * nd, tuple(padding)
        )

    return pass_along(pass_along(x, nd - 1), nd - 2)


def dilate(x: jnp.ndarray, ksize: int = 7) -> jnp.ndarray:
    """Max filter over a ksize x ksize window; x: (..., H, W)."""
    init = -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min
    return _sep_window(x, ksize, init, jax.lax.max)


def erode(x: jnp.ndarray, ksize: int = 7) -> jnp.ndarray:
    """Min filter over a ksize x ksize window; x: (..., H, W)."""
    init = jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).max
    return _sep_window(x, ksize, init, jax.lax.min)


def closing(x: jnp.ndarray, ksize: int = 7) -> jnp.ndarray:
    """dilate then erode (the reference's cleanup pair)."""
    return erode(dilate(x, ksize), ksize)


def nearest_upsample(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """Integer-factor nearest upsample of (..., H, W) — matches
    ``F.interpolate(scale_factor=f, mode='nearest')``
    (seg_evaluation.py:117/139). One broadcast+reshape (single pass) instead
    of two jnp.repeat relayouts."""
    *lead, h, w = x.shape
    out = jnp.broadcast_to(
        x[..., :, None, :, None],
        (*lead, h, factor, w, factor),
    )
    return out.reshape(*lead, h * factor, w * factor)


def cv2_nearest_indices(in_size: int, out_size: int) -> np.ndarray:
    """cv2 INTER_NEAREST source indices: floor(dst * in/out), clipped."""
    scale = in_size / out_size
    idx = np.floor(np.arange(out_size) * scale).astype(np.int64)
    return np.clip(idx, 0, in_size - 1)


def resize_nearest_to_padded(
    x: jnp.ndarray,
    out_h: jnp.ndarray,
    out_w: jnp.ndarray,
    max_h: int,
    max_w: int,
    fill: int = 0,
) -> jnp.ndarray:
    """Nearest-resize (H, W) int map to dynamic (out_h, out_w) inside a
    static (max_h, max_w) canvas; pixels beyond (out_h, out_w) get ``fill``.

    This keeps per-image GT-size resizing (seg_evaluation.py:161) inside jit
    with static shapes: the comparison label map is padded to the same
    canvas with the ignore index, so filled pixels never score.
    """
    in_h, in_w = x.shape
    oy = jnp.arange(max_h)
    ox = jnp.arange(max_w)
    # cv2 rule: src = floor(dst * in/out)
    sy = jnp.clip((oy * in_h // jnp.maximum(out_h, 1)), 0, in_h - 1)
    sx = jnp.clip((ox * in_w // jnp.maximum(out_w, 1)), 0, in_w - 1)
    out = x[sy[:, None], sx[None, :]]
    valid = (oy[:, None] < out_h) & (ox[None, :] < out_w)
    return jnp.where(valid, out, fill)
