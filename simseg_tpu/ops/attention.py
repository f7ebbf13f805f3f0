"""Multi-head attention core.

Two lowerings: a fused einsum chain XLA maps onto the MXU (exact-parity f32
lane, and the masked BERT path), and a VMEM-resident Pallas kernel
(ops/flash_attention.py) for the bias-free bf16 ViT path, where it removes
the (B, H, T, T) score tensor's HBM round trips.
"""

from __future__ import annotations

import contextlib
import contextvars
from typing import Optional

import jax
import jax.numpy as jnp

# trace-time marker: "the forward being traced right now will be
# differentiated". jit tracing executes the wrapped Python synchronously, so
# a contextvar set inside the grad-taken closure (engine/train_step.py) is
# visible to every attention call it reaches — without threading a kwarg
# through every module in between. Dropout's `deterministic` is NOT this
# signal: a no-dropout training forward runs deterministic=True yet still
# has a backward pass.
_TRAINING_TRACE = contextvars.ContextVar("attention_training", default=False)


@contextlib.contextmanager
def attention_training():
    """Mark the enclosed (trace-time) region as differentiated: eligible
    attention calls route through the fused fwd+bwd Pallas kernel
    (``flash_mha_train``) instead of the inference kernel/einsum."""
    token = _TRAINING_TRACE.set(True)
    try:
        yield
    finally:
        _TRAINING_TRACE.reset(token)


def multi_head_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    num_heads: int,
    attention_bias: Optional[jnp.ndarray] = None,
    dtype: jnp.dtype = jnp.float32,
    use_flash: str = "auto",
    training: Optional[bool] = None,
) -> jnp.ndarray:
    """q, k, v: (B, T, D) with D = num_heads * head_dim.

    attention_bias: optional additive bias broadcastable to (B, H, Tq, Tk)
    (used for padding masks). Returns (B, T, D).

    use_flash: 'auto' routes the bias-free bf16 mid-length case (the ViT
    towers) through the VMEM-resident Pallas kernel
    (ops/flash_attention.py); 'never' keeps the einsum path; 'interpret'
    forces the kernel in interpreter mode (CPU tests).

    training: this call will be differentiated — routes eligible shapes
    through ``flash_mha_train`` (fused Pallas forward AND backward), whose
    cost model differs from the inference kernel's (see
    ``flash_train_supported``). None (default) consults the ambient
    ``attention_training()`` region the train step opens around its
    differentiated forward.
    """
    if training is None:
        training = _TRAINING_TRACE.get()
    b, tq, d = q.shape
    tk = k.shape[1]
    if d % num_heads != 0:
        raise ValueError(f"model dim {d} not divisible by num_heads {num_heads}")
    hd = d // num_heads

    # transpose-free head split: einsums carry the head dim directly, so XLA
    # skips the (b,t,h,d)->(b,h,t,d) relayout copies (~10% fwd time at ViT-B)
    qh = q.reshape(b, tq, num_heads, hd)
    kh = k.reshape(b, tk, num_heads, hd)
    vh = v.reshape(b, tk, num_heads, hd)
    # fold the 1/sqrt(hd) scale into q (a (B,T,H,hd) multiply) in q's own
    # dtype — multiplying the (B,H,Tq,Tk) scores by an f32 scalar would
    # silently promote the whole score tensor to f32
    qh = qh * jnp.asarray(hd, jnp.float32).astype(qh.dtype) ** -0.5

    def einsum_attn(qh, kh, vh):
        # scores accumulate in the compute dtype on the MXU (bf16 in the
        # bf16 policy)
        score_t = jnp.float32 if dtype == jnp.float32 else jnp.bfloat16
        scores = jnp.einsum("bqhd,bkhd->bhqk", qh, kh,
                            preferred_element_type=score_t)
        if attention_bias is not None:
            scores = scores + attention_bias.astype(scores.dtype)
        if dtype == jnp.float32:
            probs = jax.nn.softmax(scores, axis=-1)
        else:
            # bandwidth-light softmax for the bf16 policy: the (B, H, Tq, Tk)
            # score tensor never round-trips through f32 HBM (a measured +15%
            # ViT-B fwd throughput); max-subtraction keeps exp in range and
            # the normalizing sum accumulates in f32
            m = jax.lax.stop_gradient(jnp.max(scores, axis=-1, keepdims=True))
            e = jnp.exp(scores - m)
            s = jnp.sum(e, axis=-1, keepdims=True, dtype=jnp.float32)
            probs = (e / s.astype(e.dtype)).astype(dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, vh,
                         preferred_element_type=score_t)
        return out.astype(dtype)

    if use_flash != "never" and attention_bias is None:
        # (the kernel has no bias input — a biased call must use the einsum
        # path regardless of mode, or padding masks would be dropped)
        from simseg_tpu.ops.flash_attention import (
            flash_mha, flash_mha_rowblock, flash_mha_stream, flash_mha_train,
            flash_rowblock_supported, flash_supported,
            flash_stream_supported, flash_train_supported)

        if use_flash == "interpret":
            # FORCE a kernel in interpreter mode (CPU correctness tests).
            # The long-T bands mirror the 'auto' gates; everything else
            # forces the whole-T kernel regardless of its perf band —
            # tests deliberately exercise it at shapes (short T, (1536,
            # 1680] inference, cross-attention) where 'auto' on TPU would
            # pick the einsum path instead.
            if flash_rowblock_supported(tq, tk, hd, dtype, attention_bias,
                                        training):
                kernel = flash_mha_rowblock
            elif flash_stream_supported(tq, tk, hd, dtype, attention_bias):
                kernel = flash_mha_stream
            elif training:
                kernel = flash_mha_train
            else:
                kernel = flash_mha
            out = kernel(qh, kh, vh, True)
            return out.reshape(b, tq, d).astype(dtype)
        if training and flash_train_supported(b, num_heads, tq, tk, hd,
                                              dtype, attention_bias):
            out = jax.lax.platform_dependent(
                qh, kh, vh,
                tpu=lambda a, b_, c: flash_mha_train(a, b_, c, False)
                .astype(dtype),
                default=einsum_attn,
            )
            return out.reshape(b, tq, d)
        if flash_rowblock_supported(tq, tk, hd, dtype, attention_bias,
                                    training):
            # past the whole-T kernels' VMEM ceiling but k/v still fit
            # VMEM whole: q-tiled exact-softmax kernel, correct in both
            # inference and differentiated regions (split custom_vjp)
            out = jax.lax.platform_dependent(
                qh, kh, vh,
                tpu=lambda a, b_, c: flash_mha_rowblock(a, b_, c)
                .astype(dtype),
                default=einsum_attn,
            )
            return out.reshape(b, tq, d)
        if flash_stream_supported(tq, tk, hd, dtype, attention_bias):
            # the unbounded tail: online-softmax streaming kernel, whose
            # custom_vjp also streams the backward
            out = jax.lax.platform_dependent(
                qh, kh, vh,
                tpu=lambda a, b_, c: flash_mha_stream(a, b_, c)
                .astype(dtype),
                default=einsum_attn,
            )
            return out.reshape(b, tq, d)
        if flash_supported(tq, tk, hd, dtype, attention_bias):
            # The kernel-vs-einsum choice is resolved per LOWERING PLATFORM
            # (lax.platform_dependent), not by the tracing host's backend:
            # an artifact exported from a CPU host with platforms=('tpu',)
            # bakes the same Pallas path live TPU eval takes, so serving.py's
            # served-equals-evaluated guarantee holds regardless of which
            # host staged the export. CPU lowerings (tests, cpu artifacts)
            # statically resolve to the einsum branch — the TPU kernel is
            # never lowered for them.
            out = jax.lax.platform_dependent(
                qh, kh, vh,
                tpu=lambda a, b_, c: flash_mha(a, b_, c, False)
                .astype(dtype),
                default=einsum_attn,
            )
            return out.reshape(b, tq, d)

    return einsum_attn(qh, kh, vh).reshape(b, tq, d)


def padding_bias(attention_mask: jnp.ndarray, dtype: jnp.dtype = jnp.float32) -> jnp.ndarray:
    """HF-style additive mask: (B, Tk) 0/1 -> (B, 1, 1, Tk) with 0 for keep
    and a large negative for masked keys (parity: HF BERT
    get_extended_attention_mask)."""
    bias = (1.0 - attention_mask.astype(jnp.float32)) * -1e9
    return bias[:, None, None, :].astype(dtype)
