"""Contrastive and classification losses as pure functions.

Parity: reference ``simseg/models/criteria/losses/mml_loss.py`` —
- NCE (:12-103): InfoNCE over globally-shared negatives with clamped
  temperature, optional label smoothing, optional ignore mask (masked feat2
  rows zeroed; masked loss rows zeroed but still counted in the mean —
  reference behavior kept deliberately).
- MixUpNCE (:105-197), MSE (:200-253), Triplet (:256-347),
  LabelSmoothingCrossEntropy (:350-377), SoftTargetCrossEntropy (:379-391).

TPU-native design: the reference gathers negatives with NCCL
(GatherLayer/all_gather_group) and offsets targets by rank. Here losses take
the *global* batch view: under pjit the embeddings are sharded over the
``data`` mesh axis and XLA inserts the all-gather (over ICI) when the full
logits matrix is formed — mathematically identical to the reference's
gather_backward=True path, with the gradient flowing through the gather.
Group-limited negatives (``cfg.loss.group_size``) become a block-diagonal
reshape + vmap instead of NCCL subgroups.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp


def _log_softmax(x: jnp.ndarray) -> jnp.ndarray:
    return x - jax.scipy.special.logsumexp(x, axis=-1, keepdims=True)


def label_smoothing_ce(
    logits: jnp.ndarray, targets: jnp.ndarray, smoothing: float = 0.1
) -> jnp.ndarray:
    """Per-row smoothed CE (parity: mml_loss.py:350-377). targets: int (N,)."""
    logprobs = _log_softmax(logits)
    nll = -jnp.take_along_axis(logprobs, targets[:, None], axis=-1)[:, 0]
    smooth = -jnp.mean(logprobs, axis=-1)
    return (1.0 - smoothing) * nll + smoothing * smooth


def soft_target_ce(logits: jnp.ndarray, target_probs: jnp.ndarray) -> jnp.ndarray:
    """Per-row CE against a soft target distribution
    (parity: mml_loss.py:379-391)."""
    return -jnp.sum(target_probs * _log_softmax(logits), axis=-1)


def _ce(logits: jnp.ndarray, targets: jnp.ndarray, smoothing: float) -> jnp.ndarray:
    return label_smoothing_ce(logits, targets, smoothing)


def _top1_acc(logits: jnp.ndarray, targets: jnp.ndarray,
              row_valid: Optional[jnp.ndarray]) -> jnp.ndarray:
    hit = (jnp.argmax(logits, axis=-1) == targets).astype(jnp.float32)
    if row_valid is None:
        return jnp.mean(hit)
    w = row_valid.astype(jnp.float32)
    return jnp.sum(hit * w) / jnp.maximum(jnp.sum(w), 1.0)


def info_nce(
    feat1: jnp.ndarray,
    feat2: jnp.ndarray,
    temperature: jnp.ndarray,
    ignore_mask: Optional[jnp.ndarray] = None,
    smoothing: float = 0.0,
    group_size: int = -1,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One-directional global InfoNCE (parity: mml_loss.py:51-96, the
    global_reduce branch, evaluated on the global batch).

    feat1, feat2: (N, D) embeddings (already L2-normalized by the model).
    temperature: scalar, already clamped by the model.
    group_size: if >0, negatives are restricted to contiguous groups of this
    many *samples* (block-diagonal logits) — the global-batch equivalent of
    the reference's device-group-limited gather.

    Returns (scalar loss, top-1 accuracy over non-ignored rows).
    """
    n = feat1.shape[0]
    if ignore_mask is None:
        ignore = jnp.zeros((n,), dtype=feat1.dtype)
    else:
        ignore = ignore_mask.astype(feat1.dtype)

    feat2 = feat2 * (1.0 - ignore)[:, None]

    if group_size and group_size > 0 and group_size < n:
        if n % group_size != 0:
            raise ValueError(f"group_size {group_size} must divide batch {n}")
        g = n // group_size
        f1 = feat1.reshape(g, group_size, -1)
        f2 = feat2.reshape(g, group_size, -1)
        logits = jnp.einsum("gnd,gmd->gnm", f1, f2,
                            preferred_element_type=jnp.float32) / temperature
        flat_logits = logits.reshape(g * group_size, group_size)
        targets = jnp.tile(jnp.arange(group_size), g)
        per_row = _ce(flat_logits, targets, smoothing)
        acc = _top1_acc(flat_logits, targets, (ignore < 1))
    else:
        logits = jnp.dot(feat1, feat2.T,
                         preferred_element_type=jnp.float32) / temperature
        targets = jnp.arange(n)
        per_row = _ce(logits, targets, smoothing)
        acc = _top1_acc(logits, targets, (ignore < 1))

    loss = jnp.mean(per_row * (1.0 - ignore))
    return loss, acc


def symmetric_info_nce(
    image_emb: jnp.ndarray,
    text_emb: jnp.ndarray,
    temperature: jnp.ndarray,
    ignore_mask: Optional[jnp.ndarray] = None,
    smoothing: float = 0.0,
    group_size: int = -1,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """0.5 * (i2t + t2i) (parity: pipelines/clip.py:123-149 forward_loss)."""
    i2t, i2t_acc = info_nce(image_emb, text_emb, temperature, ignore_mask,
                            smoothing, group_size)
    t2i, t2i_acc = info_nce(text_emb, image_emb, temperature, ignore_mask,
                            smoothing, group_size)
    loss = 0.5 * (i2t + t2i)
    return loss, {"i2t_acc": i2t_acc, "t2i_acc": t2i_acc}


def mixup_nce(
    feat1: jnp.ndarray,
    feat2: jnp.ndarray,
    temperature: jnp.ndarray,
    alpha: jnp.ndarray,
    flip_block: int,
    ignore_mask: Optional[jnp.ndarray] = None,
    smoothing: float = 0.0,
    group_size: int = -1,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """InfoNCE with single-modality mixup (parity: mml_loss.py:146-197):
    ``alpha * CE(logits, targets) + (1-alpha) * CE(logits, flip_targets)``
    where flip targets reverse each micro-block of ``flip_block`` rows.

    group_size: if >0, negatives are restricted to contiguous groups of
    this many samples (block-diagonal logits, same semantics as
    ``info_nce``). Flip blocks must nest inside groups so both CE terms'
    targets stay within each row's group (the BSGS path enforces the same
    nesting, engine/bsgs.py)."""
    n = feat1.shape[0]
    ignore = jnp.zeros((n,), feat1.dtype) if ignore_mask is None else ignore_mask.astype(feat1.dtype)
    feat2 = feat2 * (1.0 - ignore)[:, None]
    targets = jnp.arange(n)
    base = targets // flip_block * flip_block
    flip_targets = base + (flip_block - 1 - targets % flip_block)

    if group_size and 0 < group_size < n:
        if n % group_size != 0:
            raise ValueError(f"group_size {group_size} must divide batch {n}")
        if group_size % flip_block != 0:
            raise ValueError(
                f"mixup flip blocks must nest inside group_size groups: "
                f"flip {flip_block}, group {group_size}")
        g = n // group_size
        f1 = feat1.reshape(g, group_size, -1)
        f2 = feat2.reshape(g, group_size, -1)
        logits = jnp.einsum("gnd,gmd->gnm", f1, f2,
                            preferred_element_type=jnp.float32) / temperature
        logits = logits.reshape(n, group_size)
        # nesting guarantees each row's flip target lives in its own group,
        # so the within-group column index is just the global index mod gs
        targets = targets % group_size
        flip_targets = flip_targets % group_size
    else:
        logits = jnp.dot(feat1, feat2.T,
                         preferred_element_type=jnp.float32) / temperature

    per_row = alpha * _ce(logits, targets, smoothing) + (1 - alpha) * _ce(
        logits, flip_targets, smoothing
    )
    loss = jnp.mean(per_row * (1.0 - ignore))
    acc = _top1_acc(logits, targets, (ignore < 1))
    return loss, acc


def mse_embedding_loss(
    feat1_sim: jnp.ndarray,
    feat2: jnp.ndarray,
    feat1: Optional[jnp.ndarray] = None,
    ignore_mask: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Embedding-regression loss with a no-grad NCE accuracy probe
    (parity: mml_loss.py:224-253, including the reference's quirk of
    scaling the scalar MSE by mean(1 - ignore_mask)).

    Note: the reference's MSE.forward takes (feat1_sim, feat2, feat1) but
    the CLIP pipeline's forward_loss passes only two embeddings
    (pipelines/clip.py:129-141) — selecting MSE there crashes upstream.
    Here the two-argument call is the supported surface: feat1 defaults to
    feat1_sim for the accuracy probe."""
    if feat1 is None:
        feat1 = feat1_sim
    n = feat1.shape[0]
    w = (jnp.ones((n,), jnp.float32) if ignore_mask is None
         else 1.0 - ignore_mask.astype(jnp.float32))
    loss = jnp.mean((feat1_sim - feat2) ** 2) * jnp.mean(w)
    logits = jax.lax.stop_gradient(
        jnp.dot(feat1, feat2.T, preferred_element_type=jnp.float32)
    )
    acc = _top1_acc(logits, jnp.arange(n), (w > 0))
    return loss, acc


def triplet_loss(
    feat1: jnp.ndarray,
    feat2: jnp.ndarray,
    margin: float = 0.2,
    reduce_mode: str = "max",
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Bidirectional margin ranking loss (parity: mml_loss.py:316-347, the
    local branch evaluated on the global batch; 'max' = hard negatives)."""
    n = feat1.shape[0]
    scores = jnp.dot(feat1, feat2.T, preferred_element_type=jnp.float32)
    diag = jnp.diag(scores)
    eye = jnp.eye(n, dtype=bool)
    l12 = jnp.where(eye, 0.0, jnp.maximum(margin + scores - diag[:, None], 0.0))
    l21 = jnp.where(eye, 0.0, jnp.maximum(margin + scores - diag[None, :], 0.0))
    if reduce_mode == "mean":
        l12 = jnp.sum(l12, axis=1) / (n - 1)
        l21 = jnp.sum(l21, axis=0) / (n - 1)
    elif reduce_mode == "max":
        l12 = jnp.max(l12, axis=1)
        l21 = jnp.max(l21, axis=0)
    else:
        raise NotImplementedError(reduce_mode)
    loss = jnp.sum(l12 + l21)
    targets = jnp.arange(n)
    i2t_acc = _top1_acc(scores, targets, None)
    t2i_acc = _top1_acc(scores.T, targets, None)
    return loss, i2t_acc, t2i_acc
