"""Int8 post-training quantization for inference matmuls.

Beyond-reference serving feature (the torch reference has no quantized
path): the v5e MXU runs int8 x int8 -> int32 at 394 TOPS — 2x the bf16
peak — so weight+activation int8 roughly doubles the speed-of-light of the
image tower's Dense matmuls, which carry ~85% of its FLOPs.

Two schemes (the standard transformer PTQ recipes):

``quant='int8'`` — dynamic per-token activations:
- weights: symmetric per-OUTPUT-CHANNEL int8, scale_w[n] = max|W[:, n]|/127.
- activations: DYNAMIC symmetric per-token int8 (scale_x[b, t] =
  max|x[b, t, :]|/127, computed on the fly). Tracks token-wise outliers of
  post-GELU/post-LN activations; the dequant stays a rank-1 outer product.

``quant='int8_static'`` — calibrated per-input-channel activations:
- a calibration sweep (``cache_quant_state``) records a[k] = max|x[..., k]|
  per input channel; the a[k]/127 factor is FOLDED INTO THE WEIGHTS before
  their per-output-channel quantization (SmoothQuant-style), so the forward
  quantizes activations with one fused multiply+round (no per-token max
  reduction — the reduction is what makes the dynamic mode a measured
  regression at long T, BASELINE.md) and dequantizes with the per-output
  scale alone: y = acc * sw. Strictly less work per matmul than bf16's
  epilogue-free dot at the same MXU rate doubling.

Weight caching: quantized weights live in the ``'quant'`` flax variable
collection, populated by ``cache_quant_state`` (one forward pass with the
collection mutable). Without the cache the weights are re-quantized from
the f32 params inside every jitted call — constant-folded in baked-weights
serving exports, but a full extra read of the f32 params per step when the
params are jit *arguments* (bench/eval). The cache is derived state: re-run
``cache_quant_state`` after loading different params, or a stale cache wins.

- accumulate int32 on the MXU (``preferred_element_type``), add the f32
  bias, cast to the model compute dtype.

Inference only: ``jnp.round`` has zero gradient almost everywhere, so a
quantized tower would train silently to nothing — the runner refuses
``quant`` under training (core/runner.py), mirroring the other
composition guards.
"""

from __future__ import annotations

from functools import partial
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


def _int8_dot(xq: jnp.ndarray, wq: jnp.ndarray) -> jnp.ndarray:
    """int8 (..., K) @ int8 (K, N) -> int32 (..., N) on the MXU."""
    return jax.lax.dot_general(
        xq, wq,
        dimension_numbers=(((xq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )


def int8_matmul(x: jnp.ndarray, kernel: jnp.ndarray,
                bias: Optional[jnp.ndarray] = None,
                out_dtype: jnp.dtype = jnp.float32,
                wq: Optional[jnp.ndarray] = None,
                sw: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Dynamic-activation quantized x @ kernel (+ bias): x (..., K) any
    float, kernel (K, N) f32. int8 x int8 -> int32 on the MXU, rank-1
    dequant, f32 bias add, cast to out_dtype. Pass precomputed (wq, sw)
    to skip the per-call weight quantization."""
    xq, sx = quantize_rowwise(x)          # (..., K) int8, (..., 1) f32
    if wq is None or sw is None:
        wq, sw = quantize_colwise(kernel)  # (K, N) int8, (N,) f32
    acc = _int8_dot(xq, wq)
    y = acc.astype(jnp.float32) * sx * sw
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(out_dtype)


def int8_matmul_static(x: jnp.ndarray, rcp_a: jnp.ndarray,
                       wq: jnp.ndarray, sw: jnp.ndarray,
                       bias: Optional[jnp.ndarray] = None,
                       out_dtype: jnp.dtype = jnp.float32) -> jnp.ndarray:
    """Static-activation quantized matmul: rcp_a = 127/a per input channel
    (a from calibration), wq/sw the FOLDED weights (kernel * a/127 quantized
    per output channel). One fused multiply+round+clip on the activations,
    per-output-channel dequant only."""
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) * rcp_a), -127.0, 127.0)
    acc = _int8_dot(xq.astype(jnp.int8), wq)
    y = acc.astype(jnp.float32) * sw
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(out_dtype)


class QuantDense(nn.Module):
    """Drop-in ``nn.Dense`` with an int8 forward.

    Param names/shapes are identical to ``nn.Dense`` ("kernel", "bias"),
    so bridged torch checkpoints and bf16 training checkpoints load
    unchanged — quantization is purely a forward-pass transform of the f32
    master weights.

    When the ``'quant'`` variable collection is present (built by
    ``cache_quant_state``) the precomputed int8 weights are used and the
    f32 kernel is never read (XLA dead-code-eliminates the unused input).
    ``static_acts=True`` additionally requires the calibrated per-channel
    activation absmax from that collection.
    """

    features: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32
    static_acts: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k_in = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (k_in, self.features), jnp.float32)
        bias = (self.param("bias", nn.initializers.zeros,
                           (self.features,), jnp.float32)
                if self.use_bias else None)

        cached = self.has_variable("quant", "kernel_q")
        writable = (self.is_mutable_collection("quant")
                    and not self.is_initializing())

        if self.static_acts:
            if not (cached or writable):
                if not self.is_initializing():
                    raise RuntimeError(
                        "quant='int8_static' needs calibration: run "
                        "ops.quant.cache_quant_state(...) on the loaded "
                        "variables before inference")
                # init trace: dynamic fallback just to produce shapes
                return int8_matmul(x, kernel, bias, self.dtype)
            amax = self.variable(
                "quant", "x_absmax",
                lambda: jnp.max(jnp.abs(x.astype(jnp.float32)).reshape(-1, k_in), axis=0))
            if writable:
                amax.value = jnp.maximum(
                    amax.value,
                    jnp.max(jnp.abs(x.astype(jnp.float32)).reshape(-1, k_in), axis=0))
            a = jnp.maximum(amax.value, 1e-6)
            # fold a/127 into the weights, quantize per output channel; on a
            # writable (calibration) pass always recompute so the LAST pass
            # bakes the full calibration set's running max
            def _folded():
                return quantize_colwise(kernel * (a[:, None] / 127.0))
            kq = self.variable("quant", "kernel_q", lambda: _folded()[0])
            sw = self.variable("quant", "w_scale", lambda: _folded()[1])
            if writable:
                wq_new, sw_new = _folded()
                kq.value, sw.value = wq_new, sw_new
            return int8_matmul_static(x, 127.0 / a, kq.value, sw.value,
                                      bias, self.dtype)

        # dynamic per-token activations
        if cached or writable:
            kq = self.variable("quant", "kernel_q",
                               lambda: quantize_colwise(kernel)[0])
            sw = self.variable("quant", "w_scale",
                               lambda: quantize_colwise(kernel)[1])
            return int8_matmul(x, kernel, bias, self.dtype,
                               wq=kq.value, sw=sw.value)
        return int8_matmul(x, kernel, bias, self.dtype)


def cache_quant_state(model, variables, apply_calls):
    """Populate the ``'quant'`` collection: cached int8 weights, plus (for
    ``int8_static``) the calibrated per-channel activation absmax.

    ``apply_calls``: iterable of (args, kwargs) forwarded to
    ``model.apply(variables, *args, mutable=['quant'], **kwargs)`` in order
    — use forwards that touch every quantized tower (e.g. one image-tower
    and one text-tower call). For ``int8_static`` pass several
    representative batches; for plain ``int8`` one tiny batch suffices
    (only the weights are cached).

    Returns ``variables`` with the accumulated collection attached. The
    cache is DERIVED state: any pre-existing ``'quant'`` collection is
    dropped and rebuilt, and this must re-run after swapping params.
    """
    vs = {k: v for k, v in variables.items() if k != "quant"}
    for args, kwargs in apply_calls:
        _, muts = model.apply(vs, *args, mutable=["quant"], **kwargs)
        vs = {**vs, "quant": muts["quant"]}
    return vs


def dense_cls(quant: str):
    """Dense-layer factory for the ``quant`` arch knob: '' / 'none' ->
    nn.Dense, 'int8' -> QuantDense (dynamic per-token activations),
    'int8_static' -> QuantDense with calibrated static activation scales."""
    if quant in (None, "", "none"):
        return nn.Dense
    if quant == "int8":
        return QuantDense
    if quant == "int8_static":
        return partial(QuantDense, static_acts=True)
    raise NotImplementedError(
        f"quant='{quant}' (supported: 'none', 'int8', 'int8_static')")
