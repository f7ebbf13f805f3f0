"""On-device evaluation metrics: mIoU confusion accumulation, top-k accuracy.

Parity: reference ``simseg/utils/metrics.py:5-99`` (mean_iou via per-image
intersect/union histograms with ignore_index) and
``simseg/utils/misc.py:462-478`` (calc_topk_accuracy). The rebuild keeps the
whole accumulation on device: histograms are computed with one-hot matmuls /
bincount-style scatters that XLA lowers efficiently, so segmentation eval
never round-trips masks to the host.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def intersect_and_union(
    pred: jnp.ndarray,
    label: jnp.ndarray,
    num_classes: int,
    ignore_index: int = 255,
    label_map: tuple = (),
    reduce_zero_label: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-image class-area histograms (parity: metrics.py:37-75).

    pred/label: integer maps of identical shape. Pixels where
    ``label == ignore_index`` are excluded. Returns (intersect, union,
    pred_area, label_area), each shape (num_classes,), float64-accumulable.

    ``label_map``: ((old_id, new_id), ...) remaps applied to the label
    SEQUENTIALLY on the mutated map — the reference (metrics.py:55-57)
    rewrites the tensor in place per entry, so later entries see earlier
    rewrites (a {1: 2, 2: 3} map sends original 1s to 3). Must be static
    (hashable) under jit.
    ``reduce_zero_label``: the reference's 0-is-unlabeled convention
    (metrics.py:58-61): 0 -> ignored, every other id shifts down by 1
    (original ``ignore_index`` stays ignored).
    """
    pred = pred.reshape(-1)
    label = label.reshape(-1)
    for old_id, new_id in tuple(label_map):
        label = jnp.where(label == old_id, new_id, label)
    if reduce_zero_label:
        # 0 -> 255; x -> x-1; 254 -> 255 (the masking below still uses the
        # caller's ignore_index, exactly as the reference does)
        label = jnp.where(label == 0, 255, label) - 1
        label = jnp.where(label == 254, 255, label)
    valid = label != ignore_index

    def hist(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        # bincount with explicit length; masked-out pixels routed to an
        # overflow bin then dropped.
        x = jnp.where(mask, x, num_classes)
        return jnp.bincount(x, length=num_classes + 1)[:num_classes]

    inter_mask = valid & (pred == label)
    area_intersect = hist(pred, inter_mask)
    area_pred = hist(pred, valid)
    area_label = hist(label, valid)
    area_union = area_pred + area_label - area_intersect
    return (
        area_intersect.astype(jnp.float32),
        area_union.astype(jnp.float32),
        area_pred.astype(jnp.float32),
        area_label.astype(jnp.float32),
    )


def mean_iou(
    results: Sequence[np.ndarray],
    gt_seg_maps: Sequence[np.ndarray],
    num_classes: int,
    ignore_index: int = 255,
    label_map=None,
    reduce_zero_label: bool = False,
) -> Tuple[np.ndarray, np.ndarray]:
    """Accumulate (intersection, union) over a list of images
    (parity: metrics.py:5-34 — returns the two accumulators; the caller
    divides and nan-means). ``label_map`` takes the reference's dict form
    (insertion order = application order) or ((old, new), ...)."""
    total_i = np.zeros((num_classes,), dtype=np.float64)
    total_u = np.zeros((num_classes,), dtype=np.float64)
    lmap = tuple(label_map.items() if isinstance(label_map, dict)
                 else (label_map or ()))
    fn = jax.jit(intersect_and_union, static_argnums=(2, 3, 4, 5))
    for pred, label in zip(results, gt_seg_maps):
        i, u, _, _ = fn(jnp.asarray(pred), jnp.asarray(label), num_classes,
                        ignore_index, lmap, reduce_zero_label)
        total_i += np.asarray(i, dtype=np.float64)
        total_u += np.asarray(u, dtype=np.float64)
    return total_i, total_u


def miou_from_totals(total_intersect: np.ndarray, total_union: np.ndarray) -> Tuple[np.ndarray, float]:
    """Final per-class IoU and nan-mean mIoU (parity: seg_evaluation.py:176-177)."""
    with np.errstate(divide="ignore", invalid="ignore"):
        iou = total_intersect / total_union
    return iou, float(np.nanmean(iou))


def topk_accuracy(logits: jnp.ndarray, targets: jnp.ndarray, ks: Sequence[int] = (1,)) -> list:
    """Fraction of rows whose target is within the top-k logits
    (parity: misc.py:462-478)."""
    max_k = max(ks)
    _, top_idx = jax.lax.top_k(logits, max_k)  # (N, max_k)
    match = top_idx == targets[:, None]
    out = []
    for k in ks:
        out.append(jnp.mean(jnp.any(match[:, :k], axis=1).astype(jnp.float32)))
    return out
