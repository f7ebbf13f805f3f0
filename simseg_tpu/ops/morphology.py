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


def _binary_band(n: int, ksize: int, dtype) -> jnp.ndarray:
    """(n, n) 0/1 band: B[w, v] = 1 iff |w - v| <= ksize//2 — one 1-D
    max/min window as a matmul column count."""
    i = jnp.arange(n)
    d = i[:, None] - i[None, :]  # w - v (w summed over, v the output)
    pad = ksize // 2
    # window of output v is w in [v - pad, v + ksize - 1 - pad], matching
    # _sep_window's (pad, ksize - 1 - pad) padding for any ksize parity
    return ((d >= -pad) & (d <= ksize - 1 - pad)).astype(dtype)


def binary_closing_matmul(x: jnp.ndarray, ksize: int = 7) -> jnp.ndarray:
    """``closing`` for 0/1-valued float inputs via banded matmuls on the MXU
    instead of ``lax.reduce_window``: a binary window-max is (count > 0) and
    a binary window-min is (count == valid taps), with the counts from one
    (H, W) x (W, W) band matmul per axis. Exact for inputs in {0, 1}
    (integer counts <= ksize are exact in f32 MXU accumulation); border
    semantics match dilate/erode's BORDER_CONSTANT identity padding."""
    *lead, h, w = x.shape
    xr = x.reshape(-1, h, w)

    def run(dot_dtype):
        # counts are integers <= ksize — exact in any matmul dtype/precision
        band_w = _binary_band(w, ksize, dot_dtype)
        band_h = _binary_band(h, ksize, dot_dtype)
        cnt_w = jnp.sum(band_w.astype(jnp.float32), axis=0)  # taps/column
        cnt_h = jnp.sum(band_h.astype(jnp.float32), axis=0)

        def rows(v, band):
            return jnp.einsum("nhw,wv->nhv", v, band,
                              preferred_element_type=jnp.float32,
                              precision=jax.lax.Precision.DEFAULT)

        def cols(v, band):
            return jnp.einsum("nhv,hu->nuv", v, band,
                              preferred_element_type=jnp.float32,
                              precision=jax.lax.Precision.DEFAULT)

        v = xr.astype(dot_dtype)
        v = (rows(v, band_w) > 0.5).astype(dot_dtype)          # dilate rows
        v = (cols(v, band_h) > 0.5).astype(dot_dtype)          # dilate cols
        v = (rows(v, band_w) >= cnt_w[None, None, :] - 0.5).astype(dot_dtype)
        v = (cols(v, band_h) >= cnt_h[None, :, None] - 0.5)
        return v.astype(x.dtype)

    if jnp.dtype(x.dtype) == jnp.bfloat16:
        # bf16 operands ride the MXU natively on TPU; the CPU backend's
        # bf16xbf16->f32 dot is unsupported in some dispatch paths, so lower
        # an f32 dot there (resolved per LOWERING platform, keeping
        # cross-platform serving exports correct)
        y = jax.lax.platform_dependent(
            tpu=lambda: run(jnp.bfloat16),
            default=lambda: run(jnp.float32),
        )
    else:
        y = run(x.dtype)
    return y.reshape(*lead, h, w)


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
