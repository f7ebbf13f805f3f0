"""ViT position-embedding grid interpolation.

Parity: reference ``simseg/utils/interpolate_pe.py:4-27`` — when a checkpoint
was trained at one resolution (224px -> 14x14 grid) and the model runs at
another (288px -> 18x18), the patch position embeddings are bicubically
resampled on the 2-D grid; extra (CLS) token rows pass through unchanged.

torch's ``F.interpolate(mode='bicubic', align_corners=False)`` is a separable
cubic convolution with kernel parameter a=-0.75, half-pixel coordinate
mapping, and clamped borders. Since the grid sizes are static we materialize
the two per-axis interpolation matrices at trace time and apply them as
matmuls — bit-accurate to torch and MXU-friendly.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp


def _cubic_kernel(x: np.ndarray, a: float = -0.75) -> np.ndarray:
    """Cubic convolution kernel (Keys), torch's a=-0.75 variant."""
    x = np.abs(x)
    out = np.where(
        x <= 1.0,
        (a + 2.0) * x**3 - (a + 3.0) * x**2 + 1.0,
        np.where(x < 2.0, a * x**3 - 5.0 * a * x**2 + 8.0 * a * x - 4.0 * a, 0.0),
    )
    return out


def _resize_matrix(in_size: int, out_size: int) -> np.ndarray:
    """(out_size, in_size) matrix M with out = M @ in, matching torch
    upsample_bicubic2d (align_corners=False, clamped borders)."""
    scale = in_size / out_size
    ox = np.arange(out_size, dtype=np.float64)
    x = (ox + 0.5) * scale - 0.5
    base = np.floor(x).astype(np.int64)
    frac = x - base
    mat = np.zeros((out_size, in_size), dtype=np.float64)
    for tap in (-1, 0, 1, 2):
        idx = np.clip(base + tap, 0, in_size - 1)
        w = _cubic_kernel(tap - frac)
        np.add.at(mat, (np.arange(out_size), idx), w)
    return mat.astype(np.float32)


def bicubic_resize_2d(grid: jnp.ndarray, new_h: int, new_w: int) -> jnp.ndarray:
    """grid: (B, H, W, C) -> (B, new_h, new_w, C), torch-bicubic semantics."""
    _, h, w, _ = grid.shape
    row = jnp.asarray(_resize_matrix(h, new_h))
    col = jnp.asarray(_resize_matrix(w, new_w))
    out = jnp.einsum("oh,bhwc->bowc", row, grid.astype(jnp.float32))
    out = jnp.einsum("pw,bowc->bopc", col, out)
    return out


def interpolate_pos_embed(
    pos_embed: jnp.ndarray, new_num_patches: int, num_extra_tokens: int = 1
) -> jnp.ndarray:
    """pos_embed: (1, extra + N_old, D) -> (1, extra + N_new, D)."""
    dim = pos_embed.shape[-1]
    orig_n = pos_embed.shape[-2] - num_extra_tokens
    orig_size = int(round(orig_n ** 0.5))
    new_size = int(round(new_num_patches ** 0.5))
    if orig_size == new_size:
        return pos_embed
    extra = pos_embed[:, :num_extra_tokens]
    grid = pos_embed[:, num_extra_tokens:].reshape(1, orig_size, orig_size, dim)
    grid = bicubic_resize_2d(grid, new_size, new_size)
    grid = grid.reshape(1, new_size * new_size, dim)
    return jnp.concatenate([extra, grid.astype(pos_embed.dtype)], axis=1)
