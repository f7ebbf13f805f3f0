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


# ---------------------------------------------------------------------------
# Streaming (tiled, online-softmax) kernels: unbounded sequence length.
#
# The whole-T kernels above hold one (T, T) score tile in VMEM and so cap at
# _MAX_T = 1536. Past that, these row/column-tiled kernels stream k/v tiles
# through VMEM with the classic online-softmax recurrence (running max m and
# normalizer l, lane-replicated (TQ, 128) stats — the canonical Mosaic
# layout); the (T, T) scores never exist anywhere, in either pass. The
# backward is the two-kernel FlashAttention-2 split: a dq kernel (q rows
# resident, k/v streamed) and a dk/dv kernel (k/v resident, q streamed),
# both recomputing probabilities from the forward's saved per-row logsumexp.
# The lse residual is stored compactly as one f32 per query row —
# (B*H, 1, Tq)
# with q on the LANE axis — not lane-replicated in HBM; the (q-on-sublanes)
# column layout the backward's broadcasts need is rebuilt in-kernel (a
# (tile,)-element relayout per grid cell, noise next to the tile matmuls).
# The delta term rowsum(dO * o) is recomputed in-kernel from the o/g tiles
# (hd-wide reduction, negligible next to the (TQ, TK, hd) matmuls) instead
# of being precomputed and plumbed through HBM.
# ---------------------------------------------------------------------------

_TILE_STREAM = 512  # q and k tile rows; s tile = 1 MiB f32, well under VMEM

# grid dims (bh, resident-tile, streamed-tile): bh and the resident tile are
# independent (each owns disjoint output blocks; scratch accumulators are
# re-zeroed when the streamed index wraps to 0), so megacore parts may split
# them across tensorcores; only the streamed sweep carries state
_STREAM_SEMANTICS = pltpu.CompilerParams(
    dimension_semantics=("parallel", "parallel", "arbitrary"))


def _pad_t(x, t_pad):
    b, t, hd = x.shape
    if t == t_pad:
        return x
    return jnp.pad(x, ((0, 0), (0, t_pad - t), (0, 0)))


def _stream_fold(x, b, h, hd, t, t_pad):
    """(B, T, H, hd) -> (B*H, T_pad, hd), shared by both passes so their
    layouts cannot drift apart."""
    return _pad_t(jnp.transpose(x, (0, 2, 1, 3)).reshape(b * h, t, hd), t_pad)


def _stream_unfold(x, b, h, hd, t):
    return jnp.transpose(x[:, :t].reshape(b, h, t, hd), (0, 2, 1, 3))


def _stream_spec(tile, r, idx):
    return pl.BlockSpec((1, tile, r), idx, memory_space=pltpu.VMEM)


def _lse_spec(tile, idx):
    # (B*H, 1, Tq_pad) with q rows on the lane axis — the unit middle dim
    # satisfies Mosaic's block-tiling rule (second-to-last block dim must be
    # 8-divisible or equal the array dim); one (1, 1, tile) row per block
    return pl.BlockSpec((1, 1, tile), idx, memory_space=pltpu.VMEM)


def _stream_fwd_kernel(t_k, need_lse, q_ref, k_ref, v_ref, o_ref, *rest):
    if need_lse:
        lse_ref, acc_ref, m_ref, l_ref = rest
    else:
        acc_ref, m_ref, l_ref = rest
    ik = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ik == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[...] = jnp.zeros_like(l_ref)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (TQ, TK)
    # mask padded key columns (padded QUERY rows need no mask: their outputs
    # are sliced off, and the backward's g rows there are zero)
    kidx = ik * s.shape[1] + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(kidx < t_k, s, -jnp.inf)

    m_prev = m_ref[...]
    l_prev = l_ref[...]
    m_cur = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    e = jnp.exp(s - m_cur)
    alpha = jnp.exp(m_prev - m_cur)  # 0 on the first tile (m_prev = -inf)
    l_cur = l_prev * alpha + jnp.sum(e, axis=-1, keepdims=True)
    acc_ref[...] = acc_ref[...] * alpha + jax.lax.dot_general(
        e.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_ref[...] = m_cur
    l_ref[...] = l_cur

    @pl.when(ik == nk - 1)
    def _():
        o_ref[0] = (acc_ref[...] / l_ref[...]).astype(o_ref.dtype)
        if need_lse:
            # (tile, 1) column -> (tile,) lane vector relayout, once per
            # q tile
            lse_ref[0, 0] = m_ref[:, 0] + jnp.log(l_ref[:, 0])


@functools.partial(jax.jit,
                   static_argnames=("interpret", "tile", "need_lse"))
def _mha_stream_fwd(qh, kh, vh, interpret=False, tile=_TILE_STREAM,
                    need_lse=True):
    """qh/kh/vh: (B, T, H, hd), q pre-scaled. Returns ((B, Tq, H, hd) out,
    (B*H, 1, Tq_pad) per-row logsumexp for backward — None when
    ``need_lse=False``, the inference path, which skips computing/writing
    it entirely)."""
    b, tq, h, hd = qh.shape
    tk = kh.shape[1]
    tq_p = pl.cdiv(tq, tile) * tile
    tk_p = pl.cdiv(tk, tile) * tile

    spec = functools.partial(_stream_spec, tile)
    out_specs = [spec(hd, lambda bh, i, j: (bh, i, 0))]
    out_shape = [jax.ShapeDtypeStruct((b * h, tq_p, hd), qh.dtype)]
    if need_lse:
        out_specs.append(_lse_spec(tile, lambda bh, i, j: (bh, 0, i)))
        out_shape.append(
            jax.ShapeDtypeStruct((b * h, 1, tq_p), jnp.float32))

    res = pl.pallas_call(
        functools.partial(_stream_fwd_kernel, tk, need_lse),
        grid=(b * h, tq_p // tile, tk_p // tile),
        in_specs=[
            spec(hd, lambda bh, i, j: (bh, i, 0)),
            spec(hd, lambda bh, i, j: (bh, j, 0)),
            spec(hd, lambda bh, i, j: (bh, j, 0)),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((tile, hd), jnp.float32),
            pltpu.VMEM((tile, 1), jnp.float32),
            pltpu.VMEM((tile, 1), jnp.float32),
        ],
        compiler_params=_STREAM_SEMANTICS,
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * tq_p * tk_p * hd,
            bytes_accessed=(2 * b * tq * h * hd + 2 * b * tk * h * hd)
            * qh.dtype.itemsize,
            transcendentals=b * h * tq_p * tk_p,
        ),
        interpret=interpret,
    )(_stream_fold(qh, b, h, hd, tq, tq_p),
      _stream_fold(kh, b, h, hd, tk, tk_p),
      _stream_fold(vh, b, h, hd, tk, tk_p))
    out, lse = res if need_lse else (res[0], None)
    return _stream_unfold(out, b, h, hd, tq), lse


def _stream_dq_kernel(t_k, q_ref, k_ref, v_ref, g_ref, o_ref, lse_ref,
                      dq_ref, dq_acc):
    ik = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ik == 0)
    def _():
        dq_acc[...] = jnp.zeros_like(dq_acc)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    g = g_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    kidx = ik * s.shape[1] + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(kidx < t_k, s, -jnp.inf)
    # lane vector -> (TQ, 1) column relayout, then normalized probabilities
    p = jnp.exp(s - lse_ref[0, 0][:, None])
    dp = jax.lax.dot_general(
        g, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    delta = jnp.sum(g.astype(jnp.float32) * o_ref[0].astype(jnp.float32),
                    axis=-1, keepdims=True)
    ds = (p * (dp - delta)).astype(q.dtype)
    dq_acc[...] += jax.lax.dot_general(
        ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    @pl.when(ik == nk - 1)
    def _():
        dq_ref[0] = dq_acc[...].astype(dq_ref.dtype)


def _stream_dkdv_kernel(t_k, q_ref, k_ref, v_ref, g_ref, o_ref, lse_ref,
                        dk_ref, dv_ref, dk_acc, dv_acc):
    iq = pl.program_id(2)
    nq = pl.num_programs(2)

    @pl.when(iq == 0)
    def _():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    g = g_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    ik = pl.program_id(1)
    kidx = ik * s.shape[1] + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(kidx < t_k, s, -jnp.inf)
    p = jnp.exp(s - lse_ref[0, 0][:, None])
    pc = p.astype(g.dtype)
    dv_acc[...] += jax.lax.dot_general(
        pc, g, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(
        g, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    delta = jnp.sum(g.astype(jnp.float32) * o_ref[0].astype(jnp.float32),
                    axis=-1, keepdims=True)
    ds = (p * (dp - delta)).astype(q.dtype)
    dk_acc[...] += jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    @pl.when(iq == nq - 1)
    def _():
        dk_ref[0] = dk_acc[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[...].astype(dv_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret", "tile"))
def _mha_stream_bwd(qh, kh, vh, out, g, lse, interpret=False,
                    tile=_TILE_STREAM):
    """Streamed FlashAttention-2-style backward. qh/kh/vh/out/g:
    (B, T, H, hd) (out = the forward's output, for the in-kernel delta
    term); lse: the forward's (B*H, 1, Tq_pad) saved logsumexp. Returns
    (dq, dk, dv) in the input layout."""
    b, tq, h, hd = qh.shape
    tk = kh.shape[1]
    tq_p = pl.cdiv(tq, tile) * tile
    tk_p = pl.cdiv(tk, tile) * tile

    fold = functools.partial(_stream_fold, b=b, h=h, hd=hd)
    qf = fold(qh, t=tq, t_pad=tq_p)
    kf = fold(kh, t=tk, t_pad=tk_p)
    vf = fold(vh, t=tk, t_pad=tk_p)
    # padded g rows are EXACT zeros: they null the padded queries'
    # contributions to dk/dv (every term carries a g factor), so no q-row
    # masking is needed in either kernel
    gf = fold(g, t=tq, t_pad=tq_p)
    of = fold(out, t=tq, t_pad=tq_p)

    spec = functools.partial(_stream_spec, tile)

    q_of = lambda bh, i, j: (bh, i, 0)  # noqa: E731
    k_of = lambda bh, i, j: (bh, j, 0)  # noqa: E731

    dq = pl.pallas_call(
        functools.partial(_stream_dq_kernel, tk),
        grid=(b * h, tq_p // tile, tk_p // tile),
        in_specs=[
            spec(hd, q_of), spec(hd, k_of), spec(hd, k_of),
            spec(hd, q_of), spec(hd, q_of),
            _lse_spec(tile, lambda bh, i, j: (bh, 0, i)),
        ],
        out_specs=spec(hd, q_of),
        out_shape=jax.ShapeDtypeStruct((b * h, tq_p, hd), qh.dtype),
        scratch_shapes=[pltpu.VMEM((tile, hd), jnp.float32)],
        compiler_params=_STREAM_SEMANTICS,
        cost_estimate=pl.CostEstimate(
            flops=6 * b * h * tq_p * tk_p * hd,
            bytes_accessed=(5 * b * tq * h * hd + 2 * b * tk * h * hd)
            * qh.dtype.itemsize,
            transcendentals=b * h * tq_p * tk_p,
        ),
        interpret=interpret,
    )(qf, kf, vf, gf, of, lse)

    # k/v resident, q streamed: grid dim 1 walks k tiles, innermost dim 2
    # walks q tiles so the dk/dv accumulators persist across the q sweep
    kq_q = lambda bh, j, i: (bh, i, 0)  # noqa: E731
    kq_k = lambda bh, j, i: (bh, j, 0)  # noqa: E731

    dk, dv = pl.pallas_call(
        functools.partial(_stream_dkdv_kernel, tk),
        grid=(b * h, tk_p // tile, tq_p // tile),
        in_specs=[
            spec(hd, kq_q), spec(hd, kq_k), spec(hd, kq_k),
            spec(hd, kq_q), spec(hd, kq_q),
            _lse_spec(tile, lambda bh, j, i: (bh, 0, i)),
        ],
        out_specs=[spec(hd, kq_k), spec(hd, kq_k)],
        out_shape=[
            jax.ShapeDtypeStruct((b * h, tk_p, hd), kh.dtype),
            jax.ShapeDtypeStruct((b * h, tk_p, hd), vh.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((tile, hd), jnp.float32),
            pltpu.VMEM((tile, hd), jnp.float32),
        ],
        compiler_params=_STREAM_SEMANTICS,
        cost_estimate=pl.CostEstimate(
            flops=8 * b * h * tq_p * tk_p * hd,
            bytes_accessed=(4 * b * tq * h * hd + 4 * b * tk * h * hd)
            * qh.dtype.itemsize,
            transcendentals=b * h * tq_p * tk_p,
        ),
        interpret=interpret,
    )(qf, kf, vf, gf, of, lse)

    return (_stream_unfold(dq, b, h, hd, tq),
            _stream_unfold(dk, b, h, hd, tk),
            _stream_unfold(dv, b, h, hd, tk))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def flash_mha_stream(qh, kh, vh, interpret=False, tile=_TILE_STREAM):
    """Streaming fused attention on (B, T, H, hd) inputs (q pre-scaled):
    online-softmax forward, FlashAttention-2-style two-kernel backward.
    No sequence-length cap — use past ``_MAX_T`` where the whole-T kernels
    above cannot lower. The primal (non-differentiated) path skips
    computing and writing the logsumexp residual entirely."""
    out, _ = _mha_stream_fwd(qh, kh, vh, interpret=interpret, tile=tile,
                             need_lse=False)
    return out


def _stream_vjp_fwd(qh, kh, vh, interpret, tile):
    out, lse = _mha_stream_fwd(qh, kh, vh, interpret=interpret, tile=tile)
    return out, (qh, kh, vh, out, lse)


def _stream_vjp_bwd(interpret, tile, res, g):
    qh, kh, vh, out, lse = res
    return _mha_stream_bwd(qh, kh, vh, out, g.astype(qh.dtype), lse,
                           interpret=interpret, tile=tile)


flash_mha_stream.defvjp(_stream_vjp_fwd, _stream_vjp_bwd)


# ---------------------------------------------------------------------------
# Row-block kernels: q tiled, k/v whole-T resident. The mid-long band
# (_MAX_T < T <= _ROWBLOCK_MAX_T).
#
# Past _MAX_T the (T, T) score tile no longer fits VMEM, but k/v themselves
# (2*T*hd bf16 — 0.5 MiB at T=2048) still do, comfortably. So instead of
# the online-softmax recurrence, tile only the QUERY rows: each grid cell
# computes an exact softmax over its (tile_q, T) score block in one shot —
# the same math as the whole-T kernel, just on a row slab. Versus the
# streaming kernels this does no m/l bookkeeping, no k-side padding or
# masking (k rides at its exact length), and its second matmul contracts
# over the full T (deep MXU contraction instead of tile_k=512-deep). The
# backward splits like FlashAttention-2 — a dq kernel (q/g/o tiled, k/v
# resident) and a dk/dv kernel (k/v tiled, q/g/o resident) — with
# probabilities rebuilt from the forward's saved per-row logsumexp
# (same compact (B*H, 1, Tq) layout as the streaming pass).
#
# Padding analysis (q padded to the tile multiple, k exact): padded q rows
# see the real k, so their softmax/lse stay finite; their outputs are
# sliced off, their g rows are exact zeros, so dv/dk see p*0 and
# ds = p*(0-0) = 0 — no masking needed anywhere. In the dk/dv kernel k/v
# ARE padded to the k tile; the resulting junk dk/dv rows are sliced off.
# ---------------------------------------------------------------------------

# past this, the (tile_q, T) f32 score slab would force tile_q < 128;
# hand off to the streaming kernels instead. Whole band hardware-verified:
# fwd+bwd compile and run on v5e at T=3500 and T=4096 (b=1, h=12, tile 256)
_ROWBLOCK_MAX_T = 4096


def _rowblock_tile(t: int) -> int:
    """Largest q-tile keeping the (tile, T) f32 score slab ≤ ~6 MiB (the
    whole-T kernel's measured-safe VMEM footprint at T=1536 is 9.4 MiB,
    and the backward holds two slabs)."""
    for tile in (512, 256, 128):
        if tile * t * 4 <= 6 * 1024 * 1024:
            return tile
    return 128


# grid (bh, tile): every cell owns disjoint output blocks — fully parallel
_ROWBLOCK_SEMANTICS = pltpu.CompilerParams(
    dimension_semantics=("parallel", "parallel"))


def _full_spec(t, r):
    return pl.BlockSpec((1, t, r), lambda bh, i: (bh, 0, 0),
                        memory_space=pltpu.VMEM)


def _row_spec(tile, r):
    return pl.BlockSpec((1, tile, r), lambda bh, i: (bh, i, 0),
                        memory_space=pltpu.VMEM)


def _rowblock_fwd_kernel(need_lse, q_ref, k_ref, v_ref, o_ref, *rest):
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (tile_q, T) — exact full-row softmax, no recurrence
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    l = jnp.sum(e, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        (e / l).astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = o.astype(o_ref.dtype)
    if need_lse:
        lse_ref = rest[0]
        lse_ref[0, 0] = m[:, 0] + jnp.log(l[:, 0])


@functools.partial(jax.jit, static_argnames=("interpret", "need_lse"))
def _mha_rowblock_fwd(qh, kh, vh, interpret=False, need_lse=True):
    """qh/kh/vh: (B, T, H, hd), q pre-scaled. Returns ((B, Tq, H, hd) out,
    (B*H, 1, Tq_pad) per-row logsumexp — None when ``need_lse=False``)."""
    b, tq, h, hd = qh.shape
    tk = kh.shape[1]
    tile = _rowblock_tile(tk)
    tq_p = pl.cdiv(tq, tile) * tile

    out_specs = [_row_spec(tile, hd)]
    out_shape = [jax.ShapeDtypeStruct((b * h, tq_p, hd), qh.dtype)]
    if need_lse:
        out_specs.append(_lse_spec(tile, lambda bh, i: (bh, 0, i)))
        out_shape.append(
            jax.ShapeDtypeStruct((b * h, 1, tq_p), jnp.float32))

    res = pl.pallas_call(
        functools.partial(_rowblock_fwd_kernel, need_lse),
        grid=(b * h, tq_p // tile),
        in_specs=[_row_spec(tile, hd), _full_spec(tk, hd),
                  _full_spec(tk, hd)],
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=_ROWBLOCK_SEMANTICS,
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * tq_p * tk * hd,
            bytes_accessed=(2 * b * tq * h * hd + 2 * b * tk * h * hd)
            * qh.dtype.itemsize,
            transcendentals=b * h * tq_p * tk,
        ),
        interpret=interpret,
    )(_stream_fold(qh, b, h, hd, tq, tq_p),
      _stream_fold(kh, b, h, hd, tk, tk),
      _stream_fold(vh, b, h, hd, tk, tk))
    out, lse = res if need_lse else (res[0], None)
    return _stream_unfold(out, b, h, hd, tq), lse


def _rowblock_dq_kernel(q_ref, k_ref, v_ref, g_ref, o_ref, lse_ref, dq_ref):
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    g = g_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    p = jnp.exp(s - lse_ref[0, 0][:, None])
    dp = jax.lax.dot_general(
        g, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    delta = jnp.sum(g.astype(jnp.float32) * o_ref[0].astype(jnp.float32),
                    axis=-1, keepdims=True)
    ds = (p * (dp - delta)).astype(q.dtype)
    dq_ref[0] = jax.lax.dot_general(
        ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(dq_ref.dtype)


def _rowblock_dkdv_kernel(q_ref, k_ref, v_ref, g_ref, o_ref, lse_ref,
                          dk_ref, dv_ref):
    # k/v tiled, q/g/o whole-T resident: the q contraction runs full-depth
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    g = g_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (Tq_pad, tile_k)
    p = jnp.exp(s - lse_ref[0, 0][:, None])
    dv_ref[0] = jax.lax.dot_general(
        p.astype(g.dtype), g, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dv_ref.dtype)
    dp = jax.lax.dot_general(
        g, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    delta = jnp.sum(g.astype(jnp.float32) * o_ref[0].astype(jnp.float32),
                    axis=-1, keepdims=True)
    ds = (p * (dp - delta)).astype(q.dtype)
    dk_ref[0] = jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(dk_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _mha_rowblock_bwd(qh, kh, vh, out, g, lse, interpret=False):
    """Row-block backward: dq over q tiles (k/v resident), dk/dv over k
    tiles (q/g/o resident). lse: the forward's (B*H, 1, Tq_pad)."""
    b, tq, h, hd = qh.shape
    tk = kh.shape[1]
    tile = _rowblock_tile(tk)
    tq_p = pl.cdiv(tq, tile) * tile
    tk_p = pl.cdiv(tk, tile) * tile

    fold = functools.partial(_stream_fold, b=b, h=h, hd=hd)
    qf = fold(qh, t=tq, t_pad=tq_p)
    kf = fold(kh, t=tk, t_pad=tk)  # exact length for the q-tiled kernels
    vf = fold(vh, t=tk, t_pad=tk)
    gf = fold(g, t=tq, t_pad=tq_p)  # padded g rows are exact zeros
    of = fold(out, t=tq, t_pad=tq_p)

    dq = pl.pallas_call(
        _rowblock_dq_kernel,
        grid=(b * h, tq_p // tile),
        in_specs=[
            _row_spec(tile, hd), _full_spec(tk, hd), _full_spec(tk, hd),
            _row_spec(tile, hd), _row_spec(tile, hd),
            _lse_spec(tile, lambda bh, i: (bh, 0, i)),
        ],
        out_specs=_row_spec(tile, hd),
        out_shape=jax.ShapeDtypeStruct((b * h, tq_p, hd), qh.dtype),
        compiler_params=_ROWBLOCK_SEMANTICS,
        cost_estimate=pl.CostEstimate(
            flops=6 * b * h * tq_p * tk * hd,
            bytes_accessed=(5 * b * tq * h * hd + 2 * b * tk * h * hd)
            * qh.dtype.itemsize,
            transcendentals=b * h * tq_p * tk,
        ),
        interpret=interpret,
    )(qf, kf, vf, gf, of, lse)

    # k/v tiled; q/g/o (and lse) ride whole-T — pad k/v to the tile
    kfp = fold(kh, t=tk, t_pad=tk_p)
    vfp = fold(vh, t=tk, t_pad=tk_p)
    full_q = functools.partial(_full_spec, tq_p)

    dk, dv = pl.pallas_call(
        _rowblock_dkdv_kernel,
        grid=(b * h, tk_p // tile),
        in_specs=[
            full_q(hd), _row_spec(tile, hd), _row_spec(tile, hd),
            full_q(hd), full_q(hd),
            pl.BlockSpec((1, 1, tq_p), lambda bh, i: (bh, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[_row_spec(tile, hd), _row_spec(tile, hd)],
        out_shape=[
            jax.ShapeDtypeStruct((b * h, tk_p, hd), kh.dtype),
            jax.ShapeDtypeStruct((b * h, tk_p, hd), vh.dtype),
        ],
        compiler_params=_ROWBLOCK_SEMANTICS,
        cost_estimate=pl.CostEstimate(
            flops=8 * b * h * tq_p * tk * hd,
            bytes_accessed=(4 * b * tq * h * hd + 4 * b * tk * h * hd)
            * qh.dtype.itemsize,
            transcendentals=b * h * tq_p * tk,
        ),
        interpret=interpret,
    )(qf, kfp, vfp, gf, of, lse)

    return (_stream_unfold(dq, b, h, hd, tq),
            _stream_unfold(dk, b, h, hd, tk),
            _stream_unfold(dv, b, h, hd, tk))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def flash_mha_rowblock(qh, kh, vh, interpret=False):
    """Row-block fused attention on (B, T, H, hd) inputs (q pre-scaled):
    exact per-row softmax over whole-T-resident k/v, FlashAttention-2-style
    split backward. For the _MAX_T < T <= _ROWBLOCK_MAX_T band. The primal
    path skips the logsumexp residual entirely."""
    out, _ = _mha_rowblock_fwd(qh, kh, vh, interpret=interpret,
                               need_lse=False)
    return out


def _rowblock_vjp_fwd(qh, kh, vh, interpret):
    out, lse = _mha_rowblock_fwd(qh, kh, vh, interpret=interpret)
    return out, (qh, kh, vh, out, lse)


def _rowblock_vjp_bwd(interpret, res, g):
    qh, kh, vh, out, lse = res
    return _mha_rowblock_bwd(qh, kh, vh, out, g.astype(qh.dtype), lse,
                             interpret=interpret)


flash_mha_rowblock.defvjp(_rowblock_vjp_fwd, _rowblock_vjp_bwd)


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


def _long_t_eligible(tq: int, tk: int, hd: int, dtype,
                     attention_bias) -> bool:
    if attention_bias is not None or dtype == jnp.float32:
        return False
    if hd % 64 != 0 or hd > 256:
        return False
    return tq == tk  # self-attention towers only


# Measured in-tower crossover vs the bf16-score einsum path (ViT-B heads,
# b=8, v5e, 2026-08-17): einsum 1.04x faster at T=1601, row-block 1.12x at
# T=1937 and 1.19x at T=2305 — inference switches near T~1700. Training
# (fwd+bwd) already ties at T=1601 (126.2 vs 128.9 ms) and the custom_vjp
# saves only q/k/v/o/lse instead of the (B, H, T, T) probability tensors,
# so the differentiated region switches right at the whole-T ceiling.
_ROWBLOCK_MIN_INFER = 1680


def flash_rowblock_supported(tq: int, tk: int, hd: int, dtype,
                             attention_bias, training: bool = False) -> bool:
    """Gate for ``flash_mha_rowblock``: the band past the whole-T kernels'
    VMEM ceiling (``_MAX_T``) where k/v still fit VMEM whole
    (``_ROWBLOCK_MAX_T``). Differentiated regions enter at the ceiling
    (memory + measured parity); inference enters at the measured
    einsum crossover (``_ROWBLOCK_MIN_INFER``)."""
    if not _long_t_eligible(tq, tk, hd, dtype, attention_bias):
        return False
    floor = _MAX_T if training else _ROWBLOCK_MIN_INFER
    return floor < tq <= _ROWBLOCK_MAX_T


def flash_stream_supported(tq: int, tk: int, hd: int, dtype,
                           attention_bias) -> bool:
    """Gate for ``flash_mha_stream``: sequences past even the row-block
    kernels' k/v-resident ceiling (``_ROWBLOCK_MAX_T``) — the unbounded
    tail where only the online-softmax recurrence fits. Applies to both
    inference and differentiated regions (its custom_vjp streams the
    backward too)."""
    if not _long_t_eligible(tq, tk, hd, dtype, attention_bias):
        return False
    return tq > _ROWBLOCK_MAX_T
