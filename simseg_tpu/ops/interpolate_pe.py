"""ViT position-embedding grid interpolation.

Parity: reference ``simseg/utils/interpolate_pe.py:4-27`` — when a checkpoint
was trained at one resolution (224px -> 14x14 grid) and the model runs at
another (288px -> 18x18), the patch position embeddings are bicubically
resampled on the 2-D grid; extra (CLS) token rows pass through unchanged.

torch's bicubic (align_corners=False) uses the Keys a=-0.75 kernel with
half-pixel sampling; ``jax.image.resize(method='bicubic')`` implements the
same half-pixel Keys kernel, so outputs agree to float tolerance.
"""

from __future__ import annotations

import jax.image
import jax.numpy as jnp


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
    grid = jax.image.resize(
        grid.astype(jnp.float32), (1, new_size, new_size, dim), method="bicubic"
    )
    grid = grid.reshape(1, new_size * new_size, dim)
    return jnp.concatenate([extra, grid.astype(pos_embed.dtype)], axis=1)
