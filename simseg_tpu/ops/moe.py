"""Mixture-of-Experts MLP with expert parallelism (Switch-style top-1).

Beyond-reference capability (SURVEY.md §2.8 marks EP/MoE absent upstream).
TPU-native shape: the classic dense-dispatch formulation — routing becomes
einsums over a static-capacity buffer, so the whole layer is MXU matmuls
with no dynamic shapes:

- router: per-sample (B, T, D) tokens -> softmax logits over E experts,
  top-1 assignment with a static per-sample capacity
  C = ceil(T/E * capacity_factor) (overflow tokens are dropped; the block's
  residual connection carries them through unchanged). Routing groups are
  per sample, so the dispatch buffers stay O(B * T * E * C) — linear in the
  global token count — instead of the O(G^2) a single global routing group
  would cost at production batch sizes,
- dispatch: one-hot (B, T, E, C) mask -> expert inputs (B, E, C, D),
- expert FFN: batched (B, E, C, D) x (E, D, H) einsums — every expert's
  MLP runs as one big batched matmul,
- combine: gate-weighted einsum back to (B, T, D).

Expert parallelism: the expert weights' leading E dim is sharded over the
'data' mesh axis (parallel/tp.py ep_shardings), and ``expert_sharding``
constrains the (B, E, C, D) buffers to P(None, 'data', None, None) — batch
gathered, experts scattered. GSPMD lowers the layout switch from the
batch-sharded tokens to the expert-sharded buffers as the canonical MoE
all-to-all, and each device runs the FFN for its expert slice only — the
same recipe as t5x/flaxformer MoE on TPU pods.

The Switch load-balancing auxiliary loss (E * sum_e f_e * P_e) is sown into
the 'intermediates' collection; the train step collects it when the
collection is marked mutable and adds ``loss.moe_aux_weight`` times the sum
over MoE layers to the loss (no-op in eval paths that don't request
intermediates).
"""

from __future__ import annotations

import math
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


class MoEMlp(nn.Module):
    """Drop-in replacement for the ViT block MLP (ops shapes match
    models/vit.py ViTMlp): (B, T, D) -> (B, T, out_dim)."""

    num_experts: int
    hidden_dim: int
    out_dim: int
    capacity_factor: float = 1.25
    dtype: jnp.dtype = jnp.float32
    # NamedSharding for the (B, E, C, D) expert buffers: expert dim over the
    # expert-parallel mesh axis. None = single-device / no constraint.
    expert_sharding: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True,
                 token_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """token_mask: optional (B, T) 0/1 — masked (padding) positions are
        excluded from routing, expert capacity, and the load-balance aux
        statistics; their MoE output is zero (the block's residual carries
        them through). Without it a padded text tower would spend ~80% of
        its capacity and balancing signal on [PAD] embeddings."""
        b, t, d = x.shape
        e = self.num_experts
        capacity = max(int(math.ceil(t / e * self.capacity_factor)), 1)

        # router in f32 for a stable softmax/argmax regardless of tower dtype
        logits = nn.Dense(e, dtype=jnp.float32, name="router")(
            x.astype(jnp.float32))
        probs = jax.nn.softmax(logits, axis=-1)  # (B, T, E)
        expert_idx = jnp.argmax(probs, axis=-1)  # (B, T)
        gate = jnp.max(probs, axis=-1)  # (B, T)

        assign = jax.nn.one_hot(expert_idx, e, dtype=jnp.float32)  # (B, T, E)
        if token_mask is not None:
            keep = token_mask.astype(jnp.float32)  # (B, T)
            assign = assign * keep[:, :, None]
            gate = gate * keep
        # position of each token within its (per-sample) expert buffer
        pos = jnp.cumsum(assign, axis=1) * assign - 1.0
        within = (pos >= 0) & (pos < capacity)
        # dispatch: (B, T, E, C) one-hot over the capacity slot
        dispatch = jax.nn.one_hot(
            jnp.where(within, pos, -1).astype(jnp.int32), capacity,
            dtype=x.dtype)  # one_hot(-1) = all-zeros row
        if token_mask is not None:
            dispatch = dispatch * keep.astype(x.dtype)[:, :, None, None]
        combine = dispatch * (gate.astype(x.dtype))[:, :, None, None]

        # Switch aux loss: E * sum_e (fraction of tokens -> e) * (mean prob e)
        # — statistics over REAL tokens only when a mask is given
        if token_mask is None:
            f_e = jnp.mean(assign, axis=(0, 1))
            p_e = jnp.mean(probs, axis=(0, 1))
        else:
            denom = jnp.maximum(jnp.sum(keep), 1.0)
            f_e = jnp.sum(assign, axis=(0, 1)) / denom
            p_e = jnp.sum(probs * keep[:, :, None], axis=(0, 1)) / denom
        self.sow("intermediates", "moe_aux", e * jnp.sum(f_e * p_e))

        w1 = self.param("w1", nn.initializers.lecun_normal(),
                        (e, d, self.hidden_dim), jnp.float32)
        b1 = self.param("b1", nn.initializers.zeros,
                        (e, self.hidden_dim), jnp.float32)
        w2 = self.param("w2", nn.initializers.lecun_normal(),
                        (e, self.hidden_dim, self.out_dim), jnp.float32)
        b2 = self.param("b2", nn.initializers.zeros,
                        (e, self.out_dim), jnp.float32)

        def constrain(y):
            if self.expert_sharding is not None and isinstance(y, jax.core.Tracer):
                return jax.lax.with_sharding_constraint(y, self.expert_sharding)
            return y

        # (B, T, D) -> (B, E, C, D): with the expert dim sharded, GSPMD
        # lowers the batch-sharded -> expert-sharded layout change as the
        # MoE all-to-all
        expert_in = constrain(jnp.einsum("btec,btd->becd", dispatch, x))
        h = jnp.einsum("becd,edh->bech", expert_in, w1.astype(x.dtype))
        h = nn.gelu(h + b1.astype(x.dtype)[None, :, None, :],
                    approximate=self.dtype != jnp.float32)
        out = jnp.einsum("bech,ehd->becd", h, w2.astype(x.dtype))
        out = constrain(out + b2.astype(x.dtype)[None, :, None, :])
        y = jnp.einsum("btec,becd->btd", combine, out)
        return y
