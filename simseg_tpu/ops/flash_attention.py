"""VMEM-resident multi-head attention kernel (Pallas, TPU).

Why: at ViT scale (T=325 tokens, head_dim 64) XLA materializes the
(B, H, T, T) score tensor in HBM between the two attention matmuls — the
matmul/softmax/matmul chain does ~4 HBM round trips of that tensor per
layer, ~30% of the whole ViT-B forward at batch 64. The sequences are short
enough that an entire (T, T) score tile fits in VMEM, so instead of a
streaming flash kernel with online softmax we run one fused program per
(batch, head): q/k/v tiles in, softmax in VMEM (f32 accumulation — strictly
better numerics than the bf16 einsum path it replaces), output tile out.
HBM traffic drops to the q/k/v/o tensors themselves.

Backward: jax.custom_vjp whose bwd re-derives gradients through the
reference einsum formulation (flash-style recompute — nothing extra is
saved for backward beyond q/k/v).

Parity: replaces the inner computation of ops/attention.py
multi_head_attention (reference: timm/HF softmax attention); equality is
pinned by tests against the einsum path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# VMEM budget cap: the (T, T) f32 score tile is T^2*4 bytes (6.7 MiB at
# T=1297, the largest measured-working size) plus q/k/v/o tiles and softmax
# temporaries; T=2048 would need 16 MiB for the scores alone — the whole
# per-core VMEM. 1536 (9.4 MiB) is the safe ceiling above the tested range.
_MAX_T = 1536


def _mha_kernel(q_ref, k_ref, v_ref, o_ref):
    # block shapes: (1, T, hd) -> squeeze to (T, hd)
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (Tq, Tk) f32, never leaves VMEM
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _mha_pallas(qh, kh, vh, interpret=False):
    """qh/kh/vh: (B, T, H, hd), q pre-scaled. Returns (B, Tq, H, hd).

    Mosaic block shapes must keep the trailing two dims tile-aligned or
    full-extent, so the (head) axis is folded into the grid axis by a
    (B, T, H, hd) -> (B*H, T, hd) relayout: one cheap transpose each way
    per call versus the score tensor's HBM round trips it eliminates."""
    b, tq, h, hd = qh.shape
    tk = kh.shape[1]

    def fold(x, t):
        return jnp.transpose(x, (0, 2, 1, 3)).reshape(b * h, t, hd)

    def spec(t):
        return pl.BlockSpec((1, t, hd), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        _mha_kernel,
        grid=(b * h,),
        in_specs=[spec(tq), spec(tk), spec(tk)],
        out_specs=spec(tq),
        out_shape=jax.ShapeDtypeStruct((b * h, tq, hd), qh.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * tq * tk * hd,
            bytes_accessed=(2 * b * tq * h * hd + 2 * b * tk * h * hd)
            * qh.dtype.itemsize,
            transcendentals=b * h * tq * tk,
        ),
        interpret=interpret,
    )(fold(qh, tq), fold(kh, tk), fold(vh, tk))
    return jnp.transpose(out.reshape(b, h, tq, hd), (0, 2, 1, 3))


def _mha_bwd_kernel(q_ref, k_ref, v_ref, g_ref, dq_ref, dk_ref, dv_ref):
    """Fused attention backward for one (batch, head) tile: recompute the
    softmax in VMEM, then all five gradient matmuls without the (T, T)
    score/probability tensors ever touching HBM. Gradient algebra (the
    einsum-path VJP, ops/attention.py):

        p  = softmax(q k^T)         dv = p^T g
        dp = g v^T                  ds = p * (dp - rowsum(p * dp))
        dq = ds k                   dk = ds^T q
    """
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    g = g_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (Tq, Tk)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    pc = p.astype(v.dtype)
    dv_ref[0] = jax.lax.dot_general(
        pc, g, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(dv_ref.dtype)
    dp = jax.lax.dot_general(
        g, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (Tq, Tk)
    ds = (p * (dp - jnp.sum(p * dp, axis=-1, keepdims=True))).astype(q.dtype)
    dq_ref[0] = jax.lax.dot_general(
        ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(dq_ref.dtype)
    dk_ref[0] = jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(dk_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _mha_bwd_pallas(qh, kh, vh, g, interpret=False):
    """qh/kh/vh/g: (B, T, H, hd) (q pre-scaled, g = dL/d out). Returns
    (dq, dk, dv) in the same layout. One program per (batch, head), same
    fold as the forward kernel."""
    b, tq, h, hd = qh.shape
    tk = kh.shape[1]

    def fold(x, t):
        return jnp.transpose(x, (0, 2, 1, 3)).reshape(b * h, t, hd)

    def spec(t):
        return pl.BlockSpec((1, t, hd), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    dq, dk, dv = pl.pallas_call(
        _mha_bwd_kernel,
        grid=(b * h,),
        in_specs=[spec(tq), spec(tk), spec(tk), spec(tq)],
        out_specs=[spec(tq), spec(tk), spec(tk)],
        out_shape=[
            jax.ShapeDtypeStruct((b * h, tq, hd), qh.dtype),
            jax.ShapeDtypeStruct((b * h, tk, hd), kh.dtype),
            jax.ShapeDtypeStruct((b * h, tk, hd), vh.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=10 * b * h * tq * tk * hd,
            bytes_accessed=(5 * b * tq * h * hd + 4 * b * tk * h * hd)
            * qh.dtype.itemsize,
            transcendentals=b * h * tq * tk,
        ),
        interpret=interpret,
    )(fold(qh, tq), fold(kh, tk), fold(vh, tk), fold(g, tq))

    def unfold(x, t):
        return jnp.transpose(x.reshape(b, h, t, hd), (0, 2, 1, 3))

    return unfold(dq, tq), unfold(dk, tk), unfold(dv, tk)


def _reference_mha(qh, kh, vh):
    """The einsum formulation (ops/attention.py bf16 path) used to derive
    the backward pass; f32 score accumulation to match the kernel."""
    s = jnp.einsum("bqhd,bkhd->bhqk", qh, kh,
                   preferred_element_type=jnp.float32)
    m = jax.lax.stop_gradient(jnp.max(s, axis=-1, keepdims=True))
    e = jnp.exp(s - m)
    p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(qh.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", p, vh,
                      preferred_element_type=jnp.float32).astype(qh.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def flash_mha(qh, kh, vh, interpret=False):
    """Fused attention on (B, T, H, hd) inputs (q pre-scaled by 1/sqrt(hd)).

    Forward runs the Pallas kernel; backward recomputes through the einsum
    formulation (saves only q/k/v)."""
    return _mha_pallas(qh, kh, vh, interpret=interpret)


def _flash_fwd(qh, kh, vh, interpret):
    return _mha_pallas(qh, kh, vh, interpret=interpret), (qh, kh, vh)


def _flash_bwd(interpret, res, g):
    qh, kh, vh = res
    _, vjp = jax.vjp(_reference_mha, qh, kh, vh)
    return vjp(g)


flash_mha.defvjp(_flash_fwd, _flash_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def flash_mha_train(qh, kh, vh, interpret=False):
    """Fused attention with BOTH passes in Pallas (training path): the
    forward kernel plus ``_mha_bwd_pallas`` (flash-style recompute — only
    q/k/v are saved, and the (T, T) score tensors never touch HBM in either
    direction). ``flash_mha`` keeps the einsum-derived backward for the
    parity lane."""
    return _mha_pallas(qh, kh, vh, interpret=interpret)


def _flash_train_fwd(qh, kh, vh, interpret):
    return _mha_pallas(qh, kh, vh, interpret=interpret), (qh, kh, vh)


def _flash_train_bwd(interpret, res, g):
    qh, kh, vh = res
    return _mha_bwd_pallas(qh, kh, vh, g.astype(qh.dtype),
                           interpret=interpret)


flash_mha_train.defvjp(_flash_train_fwd, _flash_train_bwd)


def flash_train_supported(b: int, h: int, tq: int, tk: int, hd: int,
                          dtype, attention_bias) -> bool:
    """Gate for ``flash_mha_train`` (fused fwd+bwd) under autodiff: the
    long-sequence band only, same as ``flash_supported``.

    MEASURED (v5e, bf16, hd=64). Long T — b=8, T=1297 (576 px ViT-B):
    fwd+bwd 3.47 ms fused vs 5.72 ms einsum (1.65x), and vs 8.49 ms for
    the Pallas-fwd + einsum-rederived-bwd hybrid the inference kernel's
    VJP would give — so a differentiated long-T region must take the
    fully-fused form. Mid T (325, the 288 px train shape): the standalone
    call wins at b*h=384 (2.68 vs 3.07 ms) BUT the full flagship train
    step is 11% SLOWER with it (71.0 vs 63.8 ms/step, batch 32): the
    kernel boundary breaks XLA's fusion of attention into the
    qkv/proj/residual neighborhood and adds the (B,T,H,hd)->(B*H,T,hd)
    relayout in both passes, which outweighs the 0.4 ms/call standalone
    margin. Hence no mid-T branch here — einsum owns T < 1024."""
    if attention_bias is not None or dtype == jnp.float32:
        return False
    if hd % 64 != 0 or hd > 256:
        return False
    if tq != tk:
        return False  # self-attention towers only (no cross shapes measured)
    return 1024 <= tq <= _MAX_T


def flash_supported(tq: int, tk: int, hd: int, dtype,
                    attention_bias) -> bool:
    """The fused kernel applies when: no additive bias (ViT path; the BERT
    padding-mask path keeps the einsum formulation), sequences long enough
    that it beats XLA's batched-einsum lowering, short enough for one VMEM
    tile, and lane-aligned head_dim. These are all static shape/dtype
    checks: the final TPU-vs-other routing happens per lowering platform
    via ``lax.platform_dependent`` at the call site (ops/attention.py), so
    a CPU host exporting a TPU artifact bakes the same kernel path live
    TPU eval takes.

    Threshold is MEASURED (v5e, bf16, ViT-B heads): at T=325 the einsum
    path wins (1.77 vs 2.38 ms — the kernel's per-(b,h) programs are too
    small and the (B,T,H,hd)->(B*H,T,hd) relayout costs HBM); crossover
    ~T=1000; at T=1297 (multi-scale seg, 576px) the kernel wins 1.13x."""
    if attention_bias is not None:
        return False
    if dtype == jnp.float32:
        return False  # f32 path is the exact-parity lane; keep it untouched
    if not (1024 <= tq <= _MAX_T and 1024 <= tk <= _MAX_T):
        return False
    if hd % 64 != 0 or hd > 256:
        return False
    return True
