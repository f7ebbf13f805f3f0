"""Token pooling ops: masked average and LoDA top-k pooling.

Parity: reference ``simseg/models/components/pooling.py`` —
- AvgPooling (:7-19): attention-mask-aware mean over the token dim.
- TopKPooling (:42-65): the paper's locality-driven alignment. Per channel,
  take the top-k activations over tokens and average them; masked positions
  are pushed to -10000 before the top-k; k is clamped to the shortest valid
  sequence in the batch.

TPU notes: ``jax.lax.top_k`` runs on the last axis, so we transpose token and
channel dims; the dynamic k-clamp is expressed with a static-k top-k plus a
position mask so shapes stay static under jit (SURVEY.md §7 hard-part 5).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

_MASK_FILL = -10000.0


def avg_pool(x: jnp.ndarray, attention_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Mean over the token dim (axis 1); mask-weighted when given."""
    if attention_mask is None:
        return jnp.mean(x, axis=1)
    mask = attention_mask[..., None].astype(x.dtype)
    return jnp.sum(x * mask, axis=1) / jnp.sum(mask, axis=1)


def topk_pool(
    x: jnp.ndarray,
    k: int,
    attention_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """LoDA top-k pooling over the token dim.

    x: (B, T, D). Returns (B, D): per channel, the mean of the k largest
    token activations. With a mask, invalid tokens are filled with -10000
    and k is clamped to ``min(mask.sum(1))`` across the batch — matching the
    reference exactly while keeping static shapes: we always take the static
    top-k and average only the first ``k_eff`` entries.
    """
    # static clamp first: lax.top_k refuses k > T (small patch grids under
    # LoDA; the reference's dynamic min-length clamp covers only the
    # masked case and its torch topk would crash the same way)
    k = min(k, x.shape[1])
    if attention_mask is not None:
        fill = jnp.asarray(_MASK_FILL, dtype=x.dtype)
        x = jnp.where(attention_mask[..., None] > 0, x, fill)
        min_len = jnp.min(jnp.sum(attention_mask > 0, axis=1))
        k_eff = jnp.minimum(jnp.asarray(k, dtype=jnp.int32), min_len.astype(jnp.int32))
    else:
        k_eff = jnp.asarray(k, dtype=jnp.int32)

    # (B, D, T) -> top-k along tokens (sorted descending)
    vals, _ = jax.lax.top_k(jnp.swapaxes(x, 1, 2), k)
    pos = jnp.arange(k, dtype=jnp.int32)
    keep = (pos < k_eff).astype(x.dtype)  # (k,)
    return jnp.sum(vals * keep, axis=-1) / k_eff.astype(x.dtype)


def l2_normalize(x: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    """x / ||x||_2 (parity: components/normalization.py:6-11 L2norm).

    Uses the same semantics as torch F.normalize: clamp the norm at eps.
    """
    norm = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / jnp.maximum(norm, eps)
