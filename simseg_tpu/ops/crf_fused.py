"""Fully-fused mean-field dense-CRF as ONE Pallas TPU kernel.

Parity: the same 2-label mean-field as ``ops/crf.py`` (the on-device
replacement for the reference's pydensecrf host loop,
``tools/seg_evaluation.py:31-54``), with identical math: unary difference
``du``, symmetric-normalized Gaussian (separable, truncated) + bilateral
(coarse-stride splat/matmul/slice) pairwise messages, ``tanh`` binary
update, optional 7x7 binary closing (``tools/seg_evaluation.py:156-159``).

Why a fused kernel: the XLA lane re-reads every fine-grid tensor from HBM
each of the 3 iterations (measured 11.28 ms of the 16.45 ms stride-8 decode
at batch 64 — ``output/decode_attrib_r4.log``) and materializes the
(N, N) bilateral kernel matrix in HBM. Here the whole refinement for one
image runs inside one grid step: the kernel matrix is built in VMEM scratch
from the 5-d features (one MXU matmul + VPU exp, never touching HBM), the
label-difference map stays resident in VMEM across all iterations, and the
closing happens before the masks are ever written back. HBM traffic per
image drops to ``du`` in + masks out.

TPU mapping notes:
- The Gaussian message ``g_norm * blur(g_norm * d)`` uses the fact that
  ``g_norm = blur(ones)^-1/2`` is a rank-1 (separable) field, so both
  normalizations fold into the 1-D band matrices once, outside the kernel:
  ``B' = diag(a) B diag(a)``. One (H,W)x(W,W) + (H,H)x(H,W) matmul pair per
  iteration, nothing elementwise.
- The coarse grid is flattened/unflattened WITHOUT jnp.reshape (Mosaic
  relayouts on non-128 minor dims) via masked matmuls: with
  ``TILE[c, n] = [c == n mod ws]`` and ``PROW[r, n] = [r == n div ws]``,
  flatten is ``sum(PROW * (q3 @ TILE), axis=0)`` and unflatten is
  ``(PROW * m) @ TILE^T`` — both exact (single nonzero per output).
- Up/downsampling are 0/1 selection matmuls (exact), scaled by 1/s^2 for
  the box mean.
"""

from __future__ import annotations

import functools
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_F_PAD = 8  # padded feature width (2 pos + 3 rgb)


# --------------------------------------------------------------------------
# host-side constant builders (numpy f64, cast to the compute dtype)
# --------------------------------------------------------------------------

@functools.lru_cache(maxsize=32)
def _np_constants(h: int, w: int, stride: int, gaussian_sxy: float,
                  closing_ksize: int, du_factor: int = 0):
    """All data-independent matrices the kernel needs, as float64 numpy."""
    s = stride
    hs, ws = h // s, w // s
    n = hs * ws

    # gaussian band with the symmetric normalization folded in
    r = int(np.ceil(3.0 * gaussian_sxy))
    x = np.arange(-r, r + 1, dtype=np.float64)
    taps = np.exp(-(x ** 2) / (2.0 * gaussian_sxy ** 2))
    # match ops/crf.py:_band_matrix + g_norm = rsqrt(blur(ones) + 1e-20),
    # computed in f32 there; f64 here is strictly tighter
    def band(m):
        i = np.arange(m)
        d = i[None, :] - i[:, None] + r
        valid = (d >= 0) & (d < taps.shape[0])
        return np.where(valid, taps[np.clip(d, 0, taps.shape[0] - 1)], 0.0)

    bh, bw = band(h), band(w)
    ah = 1.0 / np.sqrt(bh.sum(axis=0) + 1e-20)
    aw = 1.0 / np.sqrt(bw.sum(axis=0) + 1e-20)
    bandh = ah[:, None] * bh * ah[None, :]
    bandw = aw[:, None] * bw * aw[None, :]

    # nearest up/box-down selection matrices (0/1)
    uh = (np.arange(h)[:, None] // s == np.arange(hs)[None, :]).astype(np.float64)
    uw = (np.arange(w)[:, None] // s == np.arange(ws)[None, :]).astype(np.float64)

    # flatten/unflatten masks for the (hs, ws) <-> (n,) layout change
    ns = np.arange(n)
    tile = (np.arange(ws)[:, None] == (ns % ws)[None, :]).astype(np.float64)
    prow = (np.arange(hs)[:, None] == (ns // ws)[None, :]).astype(np.float64)

    # 7x7 closing bands + per-position valid tap counts (border handling
    # identical to ops/morphology.binary_closing_matmul)
    k = closing_ksize
    if k > 1:
        pad = k // 2
        i = np.arange(max(h, w))
        d = i[:, None] - i[None, :]
        bb = ((d >= -pad) & (d <= k - 1 - pad)).astype(np.float64)
        b7h, b7w = bb[:h, :h], bb[:w, :w]
    else:
        b7h = np.zeros((h, h))
        b7w = np.zeros((w, w))
    cnth = b7h.sum(axis=0)[:, None]  # (H, 1)
    cntw = b7w.sum(axis=0)[None, :]  # (1, W)

    out = dict(bandh=bandh, bandw=bandw, uh=uh, uw=uw, tile=tile,
               prow=prow, b7h=b7h, b7w=b7w, cnth=cnth, cntw=cntw)
    if du_factor:
        # patch-grid -> fine-grid nearest-upsample selection matrices for
        # the coarse unary (decode-tail kernel)
        f = du_factor
        out["puh"] = (np.arange(h)[:, None] // f
                      == np.arange(h // f)[None, :]).astype(np.float64)
        out["puw"] = (np.arange(w)[:, None] // f
                      == np.arange(w // f)[None, :]).astype(np.float64)
    return out


def _kmat_block(n: int) -> int:
    """Row-block size for building the (N, N) kernel matrix in VMEM."""
    if n <= 512:
        return n
    for blk in (256, 192, 160, 144, 128, 96, 64, 48, 32, 16, 8):
        if n % blk == 0:
            return blk
    return n  # fall back to one block (caller gates N anyway)


def fused_eligible(h: int, w: int, stride: int) -> bool:
    """Shapes the fused kernel supports with headroom in 16 MB VMEM."""
    if h % stride or w % stride:
        return False
    n = (h // stride) * (w // stride)
    # kmat (N^2 cdt) + fine-grid working set must fit; 1600^2*2B = 4.9 MB
    return n <= 1600 and h * w <= 512 * 512


# --------------------------------------------------------------------------
# the kernel
# --------------------------------------------------------------------------

def _build_kmat(feat_ref, featt_ref, sqt_ref, kmat_ref, csum_ref,
                cdt, kmat_blk):
    """Bilateral kernel matrix + symmetric-normalization vector, entirely
    in VMEM. Returns bn (1, N) in ``cdt``."""
    n = kmat_ref.shape[1]
    csum_ref[:] = jnp.zeros_like(csum_ref)

    def build(i, carry):
        rows = pl.ds(i * kmat_blk, kmat_blk)
        fi = feat_ref[0, rows, :]                       # (blk, F) f32
        sq_i = jnp.sum(fi * fi, axis=1, keepdims=True)  # (blk, 1)
        d2 = sq_i + sqt_ref[0] - 2.0 * jnp.dot(
            fi, featt_ref[0], preferred_element_type=jnp.float32)
        kblk = jnp.exp(-0.5 * jnp.maximum(d2, 0.0))     # (blk, N) f32
        kmat_ref[rows, :] = kblk.astype(cdt)
        csum_ref[:] = csum_ref[:] + jnp.sum(kblk, axis=0, keepdims=True)
        return carry

    jax.lax.fori_loop(0, n // kmat_blk, build, 0)
    return jax.lax.rsqrt(csum_ref[:] + 1e-20).astype(cdt)


def _mf_class(du_k, kmat_ref, bn, bandh_ref, bandw_ref, uh_ref, uht_ref,
              uw_ref, uwt_ref, tile_ref, tilet_ref, prow_ref,
              b7h_ref, b7w_ref, cnth_ref, cntw_ref,
              *, num_iters, gc, bc, half, scale, cdt, closing_ksize):
    """One class map's full mean-field loop (+optional closing) in VMEM:
    du_k (H, W) ``cdt`` -> 0/1 mask (H, W) ``cdt``."""

    def body(_, d):
        # gaussian message (normalization pre-folded into the bands)
        y = jnp.dot(d, bandw_ref[:],
                    preferred_element_type=jnp.float32).astype(cdt)
        g = jnp.dot(bandh_ref[:], y,
                    preferred_element_type=jnp.float32).astype(cdt)
        # bilateral: box mean -> flat -> K matvec -> unflat -> slice
        t = jnp.dot(d, uw_ref[:],
                    preferred_element_type=jnp.float32).astype(cdt)
        q3 = (jnp.dot(uht_ref[:], t,
                      preferred_element_type=jnp.float32)
              .astype(cdt) * scale)                  # (hs, ws)
        tmp = jnp.dot(q3, tile_ref[:],
                      preferred_element_type=jnp.float32).astype(cdt)
        qflat = jnp.sum(prow_ref[:] * tmp, axis=0, keepdims=True)
        m = jnp.dot(qflat * bn, kmat_ref[:],
                    preferred_element_type=jnp.float32).astype(cdt)
        m = m * bn                                   # (1, N)
        m36 = jnp.dot(prow_ref[:] * m, tilet_ref[:],
                      preferred_element_type=jnp.float32).astype(cdt)
        v = jnp.dot(m36, uwt_ref[:],
                    preferred_element_type=jnp.float32).astype(cdt)
        fineb = jnp.dot(uh_ref[:], v,
                        preferred_element_type=jnp.float32).astype(cdt)
        return jnp.tanh((du_k + gc * g + bc * fineb) * half)

    d = jnp.tanh(du_k * half)
    d = jax.lax.fori_loop(0, num_iters, body, d)
    # compare in f32: the v5e VPU has no bf16 vector compare (Mosaic
    # "Target does not support this comparison"); exact either way
    mask = (d.astype(jnp.float32) > 0).astype(cdt)

    if closing_ksize > 1:
        c = jnp.dot(mask, b7w_ref[:], preferred_element_type=jnp.float32)
        m1 = (c > 0.5).astype(cdt)                          # dilate rows
        c = jnp.dot(b7h_ref[:], m1, preferred_element_type=jnp.float32)
        m2 = (c > 0.5).astype(cdt)                          # dilate cols
        c = jnp.dot(m2, b7w_ref[:], preferred_element_type=jnp.float32)
        m3 = (c >= cntw_ref[:] - 0.5).astype(cdt)           # erode rows
        c = jnp.dot(b7h_ref[:], m3, preferred_element_type=jnp.float32)
        mask = (c >= cnth_ref[:] - 0.5).astype(cdt)         # erode cols
    return mask


def _mean_field_kernel(
    du_ref, feat_ref, featt_ref, sqt_ref,
    bandh_ref, bandw_ref, uh_ref, uht_ref, uw_ref, uwt_ref,
    tile_ref, tilet_ref, prow_ref, b7h_ref, b7w_ref, cnth_ref, cntw_ref,
    out_ref,
    kmat_ref, csum_ref,
    *, num_classes, num_iters, gaussian_compat, bilateral_compat,
    inv_ss, closing_ksize, cdt, kmat_blk,
):
    bn = _build_kmat(feat_ref, featt_ref, sqt_ref, kmat_ref, csum_ref,
                     cdt, kmat_blk)
    mf = partial(
        _mf_class, kmat_ref=kmat_ref, bn=bn, bandh_ref=bandh_ref,
        bandw_ref=bandw_ref, uh_ref=uh_ref, uht_ref=uht_ref, uw_ref=uw_ref,
        uwt_ref=uwt_ref, tile_ref=tile_ref, tilet_ref=tilet_ref,
        prow_ref=prow_ref, b7h_ref=b7h_ref, b7w_ref=b7w_ref,
        cnth_ref=cnth_ref, cntw_ref=cntw_ref,
        num_iters=num_iters, gc=jnp.asarray(gaussian_compat, cdt),
        bc=jnp.asarray(bilateral_compat, cdt), half=jnp.asarray(0.5, cdt),
        scale=jnp.asarray(inv_ss, cdt), cdt=cdt,
        closing_ksize=closing_ksize)

    for k in range(num_classes):
        out_ref[0, k] = mf(du_ref[0, k])


def _decode_tail_kernel(
    duc_ref, scores_ref, candidx_ref, feat_ref, featt_ref, sqt_ref,
    bandh_ref, bandw_ref, uh_ref, uht_ref, uw_ref, uwt_ref,
    tile_ref, tilet_ref, prow_ref, b7h_ref, b7w_ref, cnth_ref, cntw_ref,
    puh_ref, puwt_ref,
    pred_ref, bw_ref,
    kmat_ref, csum_ref,
    *, num_classes, num_iters, gaussian_compat, bilateral_compat,
    inv_ss, closing_ksize, cdt, kmat_blk,
):
    """Mean-field + closing + the whole decode tail for one image: the
    COARSE (patch-grid) unary difference is upsampled in VMEM (selection
    matmuls, exact), each class's refined mask is score-weighted and folded
    into a running argmax, and only (pred, best_weight) leave the chip —
    bit-identical to the unfused masks -> weights -> argmax chain
    (seg_decode.py steps 4-5 / reference tools/seg_evaluation.py:153-177).
    Strict '>' updates preserve argmax's first-occurrence tie rule."""
    bn = _build_kmat(feat_ref, featt_ref, sqt_ref, kmat_ref, csum_ref,
                     cdt, kmat_blk)
    mf = partial(
        _mf_class, kmat_ref=kmat_ref, bn=bn, bandh_ref=bandh_ref,
        bandw_ref=bandw_ref, uh_ref=uh_ref, uht_ref=uht_ref, uw_ref=uw_ref,
        uwt_ref=uwt_ref, tile_ref=tile_ref, tilet_ref=tilet_ref,
        prow_ref=prow_ref, b7h_ref=b7h_ref, b7w_ref=b7w_ref,
        cnth_ref=cnth_ref, cntw_ref=cntw_ref,
        num_iters=num_iters, gc=jnp.asarray(gaussian_compat, cdt),
        bc=jnp.asarray(bilateral_compat, cdt), half=jnp.asarray(0.5, cdt),
        scale=jnp.asarray(inv_ss, cdt), cdt=cdt,
        closing_ksize=closing_ksize)

    best_w = None
    pred = None
    # scores/cand_idx ride SMEM unblocked (full (B, K) arrays — SMEM block
    # shapes must equal the array dims); row-select by grid position
    img = pl.program_id(0)
    for k in range(num_classes):
        # nearest-upsample the coarse unary in VMEM: 0/1 selection matmuls
        du_k = jnp.dot(
            puh_ref[:],
            jnp.dot(duc_ref[0, k], puwt_ref[:],
                    preferred_element_type=jnp.float32),
            preferred_element_type=jnp.float32).astype(cdt)
        mask = mf(du_k)
        # invalid candidates arrive with score 0 (pre-masked by the caller)
        w = mask.astype(jnp.float32) * scores_ref[img, k]
        idx = candidx_ref[img, k]
        if k == 0:
            best_w = w
            pred = jnp.full(w.shape, idx, jnp.int32)
        else:
            upd = w > best_w
            pred = jnp.where(upd, idx, pred)
            best_w = jnp.where(upd, w, best_w)

    pred_ref[0] = jnp.where(best_w > 0.0, pred, 0)
    bw_ref[0] = best_w


@partial(
    jax.jit,
    static_argnames=(
        "num_iters", "gaussian_sxy", "gaussian_compat", "bilateral_sxy",
        "bilateral_srgb", "bilateral_compat", "stride", "closing_ksize",
        "compute_dtype", "interpret",
    ),
)
def mean_field_fused(
    du: jnp.ndarray,
    rgb: jnp.ndarray,
    num_iters: int = 3,
    gaussian_sxy: float = 3.0,
    gaussian_compat: float = 3.0,
    bilateral_sxy: float = 40.0,
    bilateral_srgb: float = 13.0,
    bilateral_compat: float = 10.0,
    stride: int = 8,
    closing_ksize: int = 0,
    compute_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jnp.ndarray:
    """One-kernel mean-field refinement (optionally + binary closing).

    du:  (B, K, H, W) unary difference ``log(p+eps) - log(1-p+eps)``.
    rgb: (B, H, W, 3) images, 0..255 scale.
    Returns (B, K, H, W) 0/1 masks in ``compute_dtype`` (closed when
    ``closing_ksize > 1``).
    """
    from simseg_tpu.ops.crf import _box_downsample
    from simseg_tpu.ops.crf_pallas import bilateral_features

    b, kk, h, w = du.shape
    s = stride
    assert h % s == 0 and w % s == 0, (h, w, s)
    hs, ws = h // s, w // s
    n = hs * ws
    cdt = jnp.dtype(compute_dtype)

    # per-image bilateral features (tiny) computed in XLA
    rgb_small = jnp.moveaxis(
        _box_downsample(jnp.moveaxis(rgb.astype(jnp.float32), -1, 1), s),
        1, -1)                                           # (B, hs, ws, 3)
    feat = jax.vmap(
        lambda r: bilateral_features(r, bilateral_sxy, bilateral_srgb, s)
    )(rgb_small)                                         # (B, N, 5)
    feat = jnp.pad(feat, ((0, 0), (0, 0), (0, _F_PAD - feat.shape[-1])))
    featt = jnp.swapaxes(feat, 1, 2)                     # (B, F, N)
    sqt = jnp.sum(feat * feat, axis=-1)[:, None, :]      # (B, 1, N)

    consts = _np_constants(h, w, s, float(gaussian_sxy), int(closing_ksize))
    bandh = jnp.asarray(consts["bandh"], cdt)
    bandw = jnp.asarray(consts["bandw"], cdt)
    uh = jnp.asarray(consts["uh"], cdt)                  # (H, hs)
    uht = jnp.asarray(consts["uh"].T, cdt)               # (hs, H)
    uw = jnp.asarray(consts["uw"], cdt)                  # (W, ws)
    uwt = jnp.asarray(consts["uw"].T, cdt)               # (ws, W)
    tile = jnp.asarray(consts["tile"], cdt)              # (ws, N)
    tilet = jnp.asarray(consts["tile"].T, cdt)           # (N, ws)
    prow = jnp.asarray(consts["prow"], cdt)              # (hs, N)
    b7h = jnp.asarray(consts["b7h"], cdt)
    b7w = jnp.asarray(consts["b7w"], cdt)
    cnth = jnp.asarray(consts["cnth"], jnp.float32)      # (H, 1)
    cntw = jnp.asarray(consts["cntw"], jnp.float32)      # (1, W)

    kmat_blk = _kmat_block(n)
    kernel = partial(
        _mean_field_kernel,
        num_classes=kk, num_iters=num_iters,
        gaussian_compat=float(gaussian_compat),
        bilateral_compat=float(bilateral_compat),
        inv_ss=1.0 / (s * s), closing_ksize=int(closing_ksize),
        cdt=cdt, kmat_blk=kmat_blk,
    )

    batch_specs = [
        pl.BlockSpec((1, kk, h, w), lambda i: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n, _F_PAD), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, _F_PAD, n), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, n), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    const_specs = [
        pl.BlockSpec(c.shape, lambda i: (0,) * c.ndim,
                     memory_space=pltpu.VMEM)
        for c in (bandh, bandw, uh, uht, uw, uwt, tile, tilet, prow,
                  b7h, b7w, cnth, cntw)
    ]

    flops_per_img = (
        2 * n * n * _F_PAD                               # kmat build
        + kk * num_iters * 2 * (h * w * (h + w) + n * n)  # blur + matvec
        + (kk * 4 * h * w * (h + w) if closing_ksize > 1 else 0)
    )
    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=batch_specs + const_specs,
        out_specs=pl.BlockSpec((1, kk, h, w), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, kk, h, w), cdt),
        scratch_shapes=[
            pltpu.VMEM((n, n), cdt),                     # kernel matrix
            pltpu.VMEM((1, n), jnp.float32),             # degree accumulator
        ],
        cost_estimate=pl.CostEstimate(
            flops=b * flops_per_img,
            bytes_accessed=b * (2 * kk * h * w * cdt.itemsize
                                + 2 * n * _F_PAD * 4),
            transcendentals=b * (n * n + kk * num_iters * h * w),
        ),
        interpret=interpret,
    )(du.astype(cdt), feat, featt, sqt,
      bandh, bandw, uh, uht, uw, uwt, tile, tilet, prow,
      b7h, b7w, cnth, cntw)
    return out


@partial(
    jax.jit,
    static_argnames=(
        "num_iters", "gaussian_sxy", "gaussian_compat", "bilateral_sxy",
        "bilateral_srgb", "bilateral_compat", "stride", "closing_ksize",
        "du_factor", "compute_dtype", "interpret",
    ),
)
def seg_decode_tail_fused(
    du_coarse: jnp.ndarray,
    rgb: jnp.ndarray,
    scores_eff: jnp.ndarray,
    cand_idx: jnp.ndarray,
    du_factor: int,
    num_iters: int = 3,
    gaussian_sxy: float = 3.0,
    gaussian_compat: float = 3.0,
    bilateral_sxy: float = 40.0,
    bilateral_srgb: float = 13.0,
    bilateral_compat: float = 10.0,
    stride: int = 8,
    closing_ksize: int = 7,
    compute_dtype=jnp.bfloat16,
    interpret: bool = False,
):
    """Mean-field CRF + closing + score-weighted argmax, one kernel.

    du_coarse:  (B, K, H/f, W/f) f32 patch-grid unary difference (f =
                ``du_factor``); nearest-upsampled in VMEM — bit-identical
                to upsampling in XLA first, with no fine-grid HBM pass.
    rgb:        (B, H, W, 3) images, 0..255 scale.
    scores_eff: (B, K) f32 candidate scores, 0 where the candidate is
                invalid (below threshold / background / 255) — matching
                ``where(valid, masks * scores, 0)`` in the unfused tail.
    cand_idx:   (B, K) int32 class ids.
    Returns (pred (B, H, W) int32 — 0 where no positive weight — and
    best_weight (B, H, W) f32), bit-identical to the unfused chain.
    """
    from simseg_tpu.ops.crf import _box_downsample
    from simseg_tpu.ops.crf_pallas import bilateral_features

    b, kk, gh, gw = du_coarse.shape
    f = du_factor
    h, w = gh * f, gw * f
    s = stride
    assert h % s == 0 and w % s == 0, (h, w, s)
    hs, ws = h // s, w // s
    n = hs * ws
    cdt = jnp.dtype(compute_dtype)

    rgb_small = jnp.moveaxis(
        _box_downsample(jnp.moveaxis(rgb.astype(jnp.float32), -1, 1), s),
        1, -1)
    feat = jax.vmap(
        lambda r: bilateral_features(r, bilateral_sxy, bilateral_srgb, s)
    )(rgb_small)
    feat = jnp.pad(feat, ((0, 0), (0, 0), (0, _F_PAD - feat.shape[-1])))
    featt = jnp.swapaxes(feat, 1, 2)
    sqt = jnp.sum(feat * feat, axis=-1)[:, None, :]

    consts = _np_constants(h, w, s, float(gaussian_sxy), int(closing_ksize),
                           du_factor=f)
    bandh = jnp.asarray(consts["bandh"], cdt)
    bandw = jnp.asarray(consts["bandw"], cdt)
    uh = jnp.asarray(consts["uh"], cdt)
    uht = jnp.asarray(consts["uh"].T, cdt)
    uw = jnp.asarray(consts["uw"], cdt)
    uwt = jnp.asarray(consts["uw"].T, cdt)
    tile = jnp.asarray(consts["tile"], cdt)
    tilet = jnp.asarray(consts["tile"].T, cdt)
    prow = jnp.asarray(consts["prow"], cdt)
    b7h = jnp.asarray(consts["b7h"], cdt)
    b7w = jnp.asarray(consts["b7w"], cdt)
    cnth = jnp.asarray(consts["cnth"], jnp.float32)
    cntw = jnp.asarray(consts["cntw"], jnp.float32)
    # the coarse-unary upsample runs in f32 (exact selection), so its
    # matrices stay f32 regardless of the compute dtype
    puh = jnp.asarray(consts["puh"], jnp.float32)         # (H, H/f)
    puwt = jnp.asarray(consts["puw"].T, jnp.float32)      # (W/f, W)

    kmat_blk = _kmat_block(n)
    kernel = partial(
        _decode_tail_kernel,
        num_classes=kk, num_iters=num_iters,
        gaussian_compat=float(gaussian_compat),
        bilateral_compat=float(bilateral_compat),
        inv_ss=1.0 / (s * s), closing_ksize=int(closing_ksize),
        cdt=cdt, kmat_blk=kmat_blk,
    )

    batch_specs = [
        pl.BlockSpec((1, kk, gh, gw), lambda i: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((1, n, _F_PAD), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, _F_PAD, n), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, n), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    const_specs = [
        pl.BlockSpec(c.shape, lambda i: (0,) * c.ndim,
                     memory_space=pltpu.VMEM)
        for c in (bandh, bandw, uh, uht, uw, uwt, tile, tilet, prow,
                  b7h, b7w, cnth, cntw, puh, puwt)
    ]

    flops_per_img = (
        2 * n * n * _F_PAD
        + kk * num_iters * 2 * (h * w * (h + w) + n * n)
        + kk * 4 * h * w * (h + w)
    )
    pred, bw = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=batch_specs + const_specs,
        out_specs=(
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, w), jnp.int32),
            jax.ShapeDtypeStruct((b, h, w), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((n, n), cdt),
            pltpu.VMEM((1, n), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=b * flops_per_img,
            bytes_accessed=b * (kk * gh * gw * 4 + 8 * h * w
                                + 2 * n * _F_PAD * 4),
            transcendentals=b * (n * n + kk * num_iters * h * w),
        ),
        interpret=interpret,
    )(du_coarse.astype(jnp.float32), scores_eff.astype(jnp.float32),
      cand_idx.astype(jnp.int32), feat, featt, sqt,
      bandh, bandw, uh, uht, uw, uwt, tile, tilet, prow,
      b7h, b7w, cnth, cntw, puh, puwt)
    return pred, bw
