"""Token merging (ToMe) for the ViT tower — beyond-reference inference/
training acceleration (Bolya et al., "Token Merging: Your ViT But Faster",
and the dense-prediction token-sharing line of work, PAPERS.md).

The reference has no equivalent; its throughput axis is batch size. Here,
``model.image_encoder.arch="{'tome_r': 16}"`` merges the ``r`` most similar
token pairs in every block, shrinking the sequence as depth grows (e.g.
325 -> 133 tokens over 12 blocks at r=16) and cutting attention+MLP FLOPs
~proportionally. Dense zero-shot segmentation still needs every patch
token, so the tower tracks where each original token went and *unmerges*
at the end: the public (B, 1+N, D) contract is unchanged, merged groups
simply share one feature row.

TPU-first formulation — everything is static-shaped dense algebra:

- bipartite soft matching: tokens at even positions (set A, CLS protected)
  match against odd positions (set B) by cosine similarity of the block's
  attention keys (mean over heads); the top-r A-tokens merge into their
  best B match. argmax/top_k pick indices; no data-dependent shapes.
- the merge itself is ONE batched matmul: a (T, T-r) one-hot assignment
  matrix (size-weighted) maps old tokens to new — MXU-friendly, no
  scatters. Merged tokens are size-weighted means; B-side tokens are never
  merged away, so no chained merges exist and order is preserved
  (compaction keeps original relative order, unlike the official impl's
  concat ordering — permutation-equivalent math, simpler bookkeeping).
- proportional attention: merged tokens carry a ``size`` weight; attention
  adds log(size) to key logits (the einsum path's additive bias).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def merge_counts(t: int, r: int, protect: int = 1) -> int:
    """Static number of tokens actually merged at length ``t`` (r clamped
    to the mergeable A-side count; A = even positions incl. the protected
    CLS)."""
    na = (t + 1) // 2
    return max(0, min(int(r), na - protect))


def bipartite_merge(
    x: jnp.ndarray,
    sizes: jnp.ndarray,
    metric: jnp.ndarray,
    r: int,
    protect: int = 1,
) -> Tuple[jnp.ndarray, jnp.ndarray, Optional[jnp.ndarray]]:
    """Merge ``r`` token pairs. x: (B, T, D); sizes: (B, T) f32; metric:
    (B, T, M). Returns (x_new (B, T-r, D), sizes_new, old2new (B, T) int32
    mapping old token index -> new index), or (x, sizes, None) when nothing
    merges. ``protect`` leading even-position tokens (the CLS) are never
    chosen as merge sources.
    """
    b, t, _ = x.shape
    r = merge_counts(t, r, protect)
    if r <= 0:
        return x, sizes, None
    na = (t + 1) // 2

    m = metric.astype(jnp.float32)
    m = m / (jnp.linalg.norm(m, axis=-1, keepdims=True) + 1e-6)
    a, bm = m[:, 0::2], m[:, 1::2]
    scores = jnp.einsum("bam,bnm->ban", a, bm)  # (B, na, nb)
    if protect:
        scores = scores.at[:, :protect, :].set(-jnp.inf)

    node_max = jnp.max(scores, axis=-1)            # (B, na)
    node_dst = jnp.argmax(scores, axis=-1)         # (B, na) index into B
    _, src_rank = jax.lax.top_k(node_max, r)       # (B, r) indices into A
    merged_a = jnp.sum(jax.nn.one_hot(src_rank, na, dtype=jnp.float32),
                       axis=1) > 0                 # (B, na)

    # old-coordinate bookkeeping. B-side destinations are never merged
    # away, so a single old->new hop suffices (no chains).
    a_old = jnp.arange(0, t, 2)
    b_old = jnp.arange(1, t, 2)
    dst_for_a = b_old[node_dst]                    # (B, na) old coords
    keep = jnp.ones((b, t), dtype=bool)
    keep = keep.at[:, 0::2].set(~merged_a)
    dst_old = jnp.broadcast_to(jnp.arange(t), (b, t))
    dst_old = dst_old.at[:, 0::2].set(
        jnp.where(merged_a, dst_for_a, a_old))
    new_idx = jnp.cumsum(keep.astype(jnp.int32), axis=1) - 1  # (B, T)
    old2new = jnp.take_along_axis(new_idx, dst_old, axis=1).astype(jnp.int32)

    # one matmul does the compaction + size-weighted merge
    onehot = jax.nn.one_hot(old2new, t - r, dtype=x.dtype)    # (B, T, T-r)
    w = onehot * sizes.astype(x.dtype)[..., None]
    sizes_new = jnp.einsum("btn,bt->bn", onehot.astype(jnp.float32),
                           sizes.astype(jnp.float32))
    x_new = jnp.einsum("btn,btd->bnd", w, x)
    x_new = x_new / sizes_new.astype(x.dtype)[..., None]
    return x_new, sizes_new, old2new


def update_gather_map(gather_map: jnp.ndarray,
                      old2new: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Compose an original-token->current-index map with a merge's
    old->new map. gather_map: (B, T_orig) int32."""
    if old2new is None:
        return gather_map
    return jnp.take_along_axis(old2new, gather_map, axis=1)


def unmerge(x: jnp.ndarray, gather_map: jnp.ndarray) -> jnp.ndarray:
    """Expand merged tokens back to the original sequence: (B, T_cur, D) +
    (B, T_orig) -> (B, T_orig, D); merged groups share a feature row."""
    return jnp.take_along_axis(x, gather_map[..., None], axis=1)


def size_bias(sizes: jnp.ndarray, dtype: jnp.dtype) -> jnp.ndarray:
    """Proportional-attention additive bias, (B, T) sizes -> (B,1,1,T)
    log(size) on the key axis (ToMe eq. 2; keeps softmax mass proportional
    to how many original tokens each merged token represents)."""
    return jnp.log(sizes)[:, None, None, :].astype(dtype)
