"""Multi-head attention core.

One fused einsum chain that XLA lowers straight onto the MXU. A Pallas
flash-attention kernel is available behind ``use_flash`` for long sequences;
for the reference workloads (<=325 image tokens, 25 text tokens) the
materialized-scores path is faster because the whole score tile fits in VMEM
after XLA fusion.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def multi_head_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    num_heads: int,
    attention_bias: Optional[jnp.ndarray] = None,
    dtype: jnp.dtype = jnp.float32,
) -> jnp.ndarray:
    """q, k, v: (B, T, D) with D = num_heads * head_dim.

    attention_bias: optional additive bias broadcastable to (B, H, Tq, Tk)
    (used for padding masks). Returns (B, T, D).
    """
    b, tq, d = q.shape
    tk = k.shape[1]
    if d % num_heads != 0:
        raise ValueError(f"model dim {d} not divisible by num_heads {num_heads}")
    hd = d // num_heads

    def split(x: jnp.ndarray, t: int) -> jnp.ndarray:
        return x.reshape(b, t, num_heads, hd).transpose(0, 2, 1, 3)

    qh, kh, vh = split(q, tq), split(k, tk), split(v, tk)
    scale = jnp.asarray(hd, dtype=jnp.float32) ** -0.5
    scores = jnp.einsum("bhqd,bhkd->bhqk", qh, kh,
                        preferred_element_type=jnp.float32) * scale
    if attention_bias is not None:
        scores = scores + attention_bias.astype(scores.dtype)
    probs = jax.nn.softmax(scores, axis=-1).astype(dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, vh,
                     preferred_element_type=jnp.float32)
    return out.transpose(0, 2, 1, 3).reshape(b, tq, d).astype(dtype)


def padding_bias(attention_mask: jnp.ndarray, dtype: jnp.dtype = jnp.float32) -> jnp.ndarray:
    """HF-style additive mask: (B, Tk) 0/1 -> (B, 1, 1, Tk) with 0 for keep
    and a large negative for masked keys (parity: HF BERT
    get_extended_attention_mask)."""
    bias = (1.0 - attention_mask.astype(jnp.float32)) * -1e9
    return bias[:, None, None, :].astype(dtype)
