"""Image-text retrieval metrics: R@1/5/10 and RSUM.

Parity: reference ``simseg/tasks/clip/hooks/utils.py:8-75`` — IndexedEmbInfo
(id-grouped embeddings with consecutive-duplicate dedup), full similarity
matrix argsort, recall@k from the first matching rank. Rank computation is a
single device matmul + top-k-free comparison: instead of argsorting the whole
row we count how many non-matching scores beat the best matching score,
which is exactly the first-match rank and keeps everything O(MN) elementwise
on the VPU after one MXU matmul.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np


@dataclass
class IndexedEmb:
    name: str
    group_idx: np.ndarray  # (N,)
    emb: np.ndarray  # (N, D)

    def unique(self) -> "IndexedEmb":
        """Keep one embedding per group id (the last occurrence after a
        stable sort — parity with unique_consecutive + cumsum offsets,
        hooks/utils.py:14-19)."""
        order = np.argsort(self.group_idx, kind="stable")
        gidx = self.group_idx[order]
        emb = self.emb[order]
        uni, counts = np.unique(gidx, return_counts=True)
        offsets = np.cumsum(counts) - 1
        return IndexedEmb(self.name, uni, emb[offsets])


def first_match_ranks(
    left: IndexedEmb, right: IndexedEmb, batch: int = 4096
) -> np.ndarray:
    """For each left row, the rank (0-based) of the first right entry with a
    matching group id when rights are sorted by similarity descending.

    Matches argsort-based ranking including torch.argsort's tie behavior
    closely enough for float embeddings (exact ties are measure-zero).
    """
    l_emb = jnp.asarray(left.emb, dtype=jnp.float32)
    r_emb = jnp.asarray(right.emb, dtype=jnp.float32)
    l_gid = jnp.asarray(left.group_idx)
    r_gid = jnp.asarray(right.group_idx)

    @jax.jit
    def ranks_of(l_chunk, l_gid_chunk, r_emb, r_gid):
        # r_emb/r_gid are explicit args (a closure would bake the whole
        # gallery into the compiled program as constants)
        sim = jnp.dot(l_chunk, r_emb.T, preferred_element_type=jnp.float32)
        match = l_gid_chunk[:, None] == r_gid[None, :]
        # best similarity among matching rights
        best_match = jnp.max(jnp.where(match, sim, -jnp.inf), axis=1)
        # rank = number of strictly-better non-matching scores... the
        # argsort-based reference counts every entry ahead of the first
        # match, including better-scoring matches of the same id. For the
        # FIRST match, better-scoring matches don't exist by definition,
        # so counting all entries with sim > best_match is exact.
        rank = jnp.sum((sim > best_match[:, None]), axis=1)
        has_match = jnp.any(match, axis=1)
        return jnp.where(has_match, rank, -1)

    out = []
    for start in range(0, left.emb.shape[0], batch):
        out.append(
            np.asarray(
                ranks_of(l_emb[start:start + batch],
                         l_gid[start:start + batch], r_emb, r_gid)
            )
        )
    return np.concatenate(out)


def recall_at_k(
    left: IndexedEmb, right: IndexedEmb, ks: Sequence[int] = (1, 5, 10)
) -> Dict[str, float]:
    """R@k for left->right retrieval (parity: RetrievalMetric.__call__)."""
    ranks = first_match_ranks(left, right)
    valid = ranks >= 0
    assert valid.sum() > 0
    out = {}
    for k in ks:
        out[f"R@{k}"] = float(((ranks >= 0) & (ranks < k)).sum() / valid.sum())
    return out


def retrieval_summary(
    image_emb: np.ndarray,
    text_emb: np.ndarray,
    image_ids: np.ndarray,
    caption_ids: np.ndarray,
) -> Dict[str, float]:
    """Full I2T + T2I table and RSUM (parity: RetrievalEvalHook
    tasks/clip/hooks/eval.py:39-81: images deduped by id, captions unique)."""
    img = IndexedEmb("image", np.asarray(image_ids), np.asarray(image_emb)).unique()
    txt = IndexedEmb("text", np.asarray(caption_ids), np.asarray(text_emb))
    # caption group ids for matching are the image ids they describe
    txt_for_match = IndexedEmb("text", np.asarray(image_ids), np.asarray(text_emb))

    i2t = recall_at_k(img, txt_for_match)
    t2i = recall_at_k(txt_for_match, img)
    result = {f"i2t_{k}": v for k, v in i2t.items()}
    result.update({f"t2i_{k}": v for k, v in t2i.items()})
    result["rsum"] = 100.0 * (sum(i2t.values()) + sum(t2i.values()))
    return result
