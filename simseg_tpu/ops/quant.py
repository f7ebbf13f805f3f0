"""Int8 post-training quantization for inference matmuls.

Beyond-reference serving feature (the torch reference has no quantized
path): the v5e MXU runs int8 x int8 -> int32 at 394 TOPS — 2x the bf16
peak — so weight+activation int8 roughly doubles the speed-of-light of the
image tower's Dense matmuls, which carry ~85% of its FLOPs.

Scheme (the standard transformer PTQ recipe, e.g. LLM.int8()/SmoothQuant
lineage, simplified to the symmetric case):
- weights: symmetric per-OUTPUT-CHANNEL int8, scale_w[n] = max|W[:, n]|/127.
  Derived from the f32 params inside the forward — one cheap elementwise
  pass under jit, and constant-folded entirely in baked-weights serving
  exports.
- activations: DYNAMIC symmetric per-token int8 (scale_x[b, t] =
  max|x[b, t, :]|/127, computed on the fly). Per-token scales track the
  strong token-wise outliers of post-GELU/post-LN transformer activations
  far better than one per-tensor scale, and the dequantization stays a
  rank-1 outer product applied to the int32 accumulator — no extra matmul.
- accumulate int32 on the MXU (``preferred_element_type``), dequantize
  y[m, n] = acc[m, n] * scale_x[m] * scale_w[n], add the f32 bias, cast to
  the model compute dtype.

Inference only: ``jnp.round`` has zero gradient almost everywhere, so a
quantized tower would train silently to nothing — the runner refuses
``quant`` under training (core/runner.py), mirroring the other
composition guards.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

_EPS = 1e-12


def quantize_rowwise(x: jnp.ndarray):
    """Symmetric int8 quantization along the last axis.

    Returns (q, scale) with q int8 shaped like x and scale f32 shaped
    x.shape[:-1] + (1,), such that q * scale ~= x. The divide/round runs in
    f32 regardless of x's dtype (a bf16 divide before rounding would waste
    ~2 bits of the 8 on rounding noise).
    """
    xf = x.astype(jnp.float32)
    scale = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0
    q = jnp.round(xf / jnp.maximum(scale, _EPS))
    return q.astype(jnp.int8), scale


def quantize_colwise(w: jnp.ndarray):
    """Symmetric per-output-channel int8 for a (K, N) weight: scale over
    axis 0. Returns (q, scale) with scale shaped (N,)."""
    wf = w.astype(jnp.float32)
    scale = jnp.max(jnp.abs(wf), axis=0) / 127.0
    q = jnp.round(wf / jnp.maximum(scale, _EPS))
    return q.astype(jnp.int8), scale


def int8_matmul(x: jnp.ndarray, kernel: jnp.ndarray,
                bias: Optional[jnp.ndarray] = None,
                out_dtype: jnp.dtype = jnp.float32) -> jnp.ndarray:
    """Quantized x @ kernel (+ bias): x (..., K) any float, kernel (K, N)
    f32. int8 x int8 -> int32 on the MXU, rank-1 dequant, f32 bias add,
    cast to out_dtype."""
    xq, sx = quantize_rowwise(x)          # (..., K) int8, (..., 1) f32
    wq, sw = quantize_colwise(kernel)     # (K, N) int8, (N,) f32
    acc = jax.lax.dot_general(
        xq, wq,
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * sx * sw
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(out_dtype)


class QuantDense(nn.Module):
    """Drop-in ``nn.Dense`` with an int8 forward.

    Param names/shapes are identical to ``nn.Dense`` ("kernel", "bias"),
    so bridged torch checkpoints and bf16 training checkpoints load
    unchanged — quantization is purely a forward-pass transform of the f32
    master weights.
    """

    features: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (x.shape[-1], self.features), jnp.float32)
        bias = (self.param("bias", nn.initializers.zeros,
                           (self.features,), jnp.float32)
                if self.use_bias else None)
        return int8_matmul(x, kernel, bias, self.dtype)


def dense_cls(quant: str):
    """Dense-layer factory for the ``quant`` arch knob: '' / 'none' ->
    nn.Dense, 'int8' -> QuantDense."""
    if quant in (None, "", "none"):
        return nn.Dense
    if quant == "int8":
        return QuantDense
    raise NotImplementedError(
        f"quant='{quant}' (supported: 'none', 'int8')")
