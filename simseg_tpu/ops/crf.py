"""Mean-field dense-CRF refinement, fully on device.

Parity: the reference refines each candidate class's similarity map with
pydensecrf (C++ on the host CPU): 2-label DenseCRF2D, unary = -log(p),
pairwise Gaussian (sxy=3, compat=3) + bilateral (sxy=40, srgb=13, compat=10),
3 mean-field iterations, argmax (``tools/seg_evaluation.py:31-54``). That
host round-trip is the reference's throughput ceiling; here the whole
refinement runs inside jit (SURVEY.md §7 step 4, hard-part 1).

Math (Krähenbühl & Koltun dense CRF, as implemented by pydensecrf):
    Q^0 = softmax(-U)
    Q^{t+1} = softmax(-U + sum_k w_k * (K̂_k Q^t))        [Potts]
with symmetric kernel normalization K̂ = D^{-1/2} K D^{-1/2},
D = diag(K 1) (pydensecrf NORMALIZE_SYMMETRIC default; self-interaction
included, matching the permutohedral implementation).

TPU mapping:
- Gaussian kernel (sigma=3): truncated separable 1-D convolutions
  (radius 3*sigma; weights beyond that are < e^-4.5).
- Bilateral kernel (sigma_xy=40, sigma_rgb=13): exact brute-force kernel at
  a coarse stride s (box splat -> N_s x N_s kernel matmul on the MXU ->
  slice back). The spatial sigma is huge compared to the stride, so the
  coarse kernel is an excellent approximation of the permutohedral lattice
  (itself an approximation). The kernel matrix is built once per image from
  squared-distance matmuls and shared by every candidate class.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


# --------------------------------------------------------------------------
# Gaussian (spatial) kernel: separable truncated convolution
# --------------------------------------------------------------------------

def _gaussian_taps(sigma: float, truncate: float = 3.0) -> np.ndarray:
    r = int(np.ceil(truncate * sigma))
    x = np.arange(-r, r + 1, dtype=np.float64)
    return np.exp(-(x**2) / (2.0 * sigma**2)).astype(np.float32)


def _sep_blur(x: jnp.ndarray, taps: jnp.ndarray) -> jnp.ndarray:
    """Separable 2-D blur. x: (..., H, W). Unnormalized kernel (the CRF's
    symmetric normalization handles mass)."""
    *lead, h, w = x.shape
    k = taps.shape[0]
    xr = x.reshape(-1, h, w)

    # rows: conv over W. Use dot with a banded matrix (static, small) — maps
    # to the MXU and avoids conv layout shuffles for many small channels.
    # Accumulate in f32 on the MXU regardless of the (possibly bf16) compute
    # dtype, then cast back.
    band_w = _band_matrix(w, taps)
    band_h = _band_matrix(h, taps)
    y = jnp.einsum("nhw,wv->nhv", xr, band_w,
                   preferred_element_type=jnp.float32).astype(x.dtype)
    y = jnp.einsum("nhv,hu->nuv", y, band_h,
                   preferred_element_type=jnp.float32).astype(x.dtype)
    return y.reshape(*lead, h, w)


def _band_matrix(n: int, taps: jnp.ndarray) -> jnp.ndarray:
    """(n, n) matrix B with B[i, j] = taps[j - i + r] (zero padding)."""
    k = taps.shape[0]
    r = k // 2
    i = jnp.arange(n)[:, None]
    j = jnp.arange(n)[None, :]
    d = j - i + r
    valid = (d >= 0) & (d < k)
    return jnp.where(valid, taps[jnp.clip(d, 0, k - 1)], 0.0)


# --------------------------------------------------------------------------
# Bilateral kernel at coarse stride: splat -> matmul -> slice
# --------------------------------------------------------------------------

def _box_downsample(x: jnp.ndarray, s: int) -> jnp.ndarray:
    """(..., H, W) -> (..., H/s, W/s) mean pooling."""
    *lead, h, w = x.shape
    x = x.reshape(*lead, h // s, s, w // s, s)
    return x.mean(axis=(-3, -1))


def _bilateral_kernel_matrix(
    rgb_small: jnp.ndarray, sxy: float, srgb: float, stride: int
) -> jnp.ndarray:
    """rgb_small: (h, w, 3) float (0..255 scale). Returns (hw, hw) kernel
    K[i,j] = exp(-|pos_i-pos_j|^2 / 2 sxy^2 - |rgb_i-rgb_j|^2 / 2 srgb^2)
    with positions in fine-pixel units (cell centers)."""
    h, w, _ = rgb_small.shape
    ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) * stride - 0.5
    xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) * stride - 0.5
    pos = jnp.stack(
        [jnp.tile(ys[:, None], (1, w)), jnp.tile(xs[None, :], (h, 1))], axis=-1
    ).reshape(-1, 2) / sxy
    col = rgb_small.reshape(-1, 3) / srgb

    feat = jnp.concatenate([pos, col], axis=-1)  # (N, 5)
    sq = jnp.sum(feat * feat, axis=-1)
    d2 = sq[:, None] + sq[None, :] - 2.0 * jnp.dot(
        feat, feat.T, preferred_element_type=jnp.float32
    )
    return jnp.exp(-0.5 * jnp.maximum(d2, 0.0))


# --------------------------------------------------------------------------
# mean-field inference
# --------------------------------------------------------------------------

def _resolve_bilateral_impl(impl: str, h: int, w: int, stride: int,
                            on_tpu: bool) -> str:
    if impl != "auto":
        return impl
    if not on_tpu:
        return "xla"
    from simseg_tpu.ops.crf_fused import fused_eligible

    # grids the single-kernel path fits in VMEM: run the WHOLE mean-field
    # loop fused (kernel matrix built in VMEM, d resident across iterations
    # — ops/crf_fused.py). Mid-size grids: materialize the (n, n) kernel in
    # HBM once and reuse it (measured 2698 vs 2431 img/s at n=1296 vs the
    # streaming kernel); large grids: the materialized kernel's HBM traffic
    # dominates, stream instead
    if fused_eligible(h, w, stride):
        return "fused"
    n_small = (h // stride) * (w // stride)
    return "xla" if n_small <= 4096 else "pallas"


def _resolve_compute_dtype(name: str, on_tpu: bool):
    if name == "auto":
        # bf16 fine-grid compute on TPU (the CRF is HBM-bandwidth bound; the
        # argmax decision is tanh-saturated and robust); exact f32 elsewhere
        # (CPU is where the parity tests compare against numpy)
        return jnp.bfloat16 if on_tpu else jnp.float32
    return jnp.dtype(name)


@partial(
    jax.jit,
    static_argnames=(
        "num_iters", "bilateral_stride", "gaussian_sxy", "gaussian_compat",
        "bilateral_sxy", "bilateral_srgb", "bilateral_compat",
        "bilateral_impl", "compute_dtype",
    ),
)
def dense_crf_batched(
    probs: jnp.ndarray,
    rgb: jnp.ndarray,
    num_iters: int = 3,
    gaussian_sxy: float = 3.0,
    gaussian_compat: float = 3.0,
    bilateral_sxy: float = 40.0,
    bilateral_srgb: float = 13.0,
    bilateral_compat: float = 10.0,
    bilateral_stride: int = 4,
    bilateral_impl: str = "auto",
    compute_dtype: str = "auto",
) -> jnp.ndarray:
    """Refine K binary probability maps per image over a batch.

    probs: (B, K, H, W) foreground probabilities in [0, 1].
    rgb:   (B, H, W, 3) images in 0..255 (any float/int dtype).
    Returns (B, K, H, W) int32 argmax masks (1 = foreground).

    The batch dim is explicit (not vmap) so the streaming Pallas kernel gets
    a real batch grid dimension.
    """
    p = jnp.clip(probs.astype(jnp.float32), 0.0, 1.0)
    du = jnp.log(p + 1e-8) - jnp.log(1.0 - p + 1e-8)
    return dense_crf_batched_du(
        du, rgb, num_iters=num_iters, gaussian_sxy=gaussian_sxy,
        gaussian_compat=gaussian_compat, bilateral_sxy=bilateral_sxy,
        bilateral_srgb=bilateral_srgb, bilateral_compat=bilateral_compat,
        bilateral_stride=bilateral_stride, bilateral_impl=bilateral_impl,
        compute_dtype=compute_dtype,
    )


@partial(
    jax.jit,
    static_argnames=(
        "num_iters", "bilateral_stride", "gaussian_sxy", "gaussian_compat",
        "bilateral_sxy", "bilateral_srgb", "bilateral_compat",
        "bilateral_impl", "compute_dtype",
    ),
)
def dense_crf_batched_du(
    du: jnp.ndarray,
    rgb: jnp.ndarray,
    num_iters: int = 3,
    gaussian_sxy: float = 3.0,
    gaussian_compat: float = 3.0,
    bilateral_sxy: float = 40.0,
    bilateral_srgb: float = 13.0,
    bilateral_compat: float = 10.0,
    bilateral_stride: int = 4,
    bilateral_impl: str = "auto",
    compute_dtype: str = "auto",
) -> jnp.ndarray:
    """:func:`dense_crf_batched` taking the precomputed unary difference
    ``du = log(p+eps) - log(1-p+eps)`` (f32, (B, K, H, W)) instead of
    probabilities. The seg decode's probabilities are piecewise-constant
    (nearest-upsampled from the patch grid), so computing du on the coarse
    grid and nearest-upsampling it is bit-identical to upsampling p first —
    this entry lets the caller skip every fine-grid unary pass."""
    bb, kk, h, w = du.shape
    s = bilateral_stride
    assert h % s == 0 and w % s == 0, (h, w, s)

    def _run(cdt, impl):
        if impl == "fused":
            from simseg_tpu.ops.crf_fused import mean_field_fused

            return mean_field_fused(
                du, rgb, num_iters=num_iters, gaussian_sxy=gaussian_sxy,
                gaussian_compat=gaussian_compat, bilateral_sxy=bilateral_sxy,
                bilateral_srgb=bilateral_srgb,
                bilateral_compat=bilateral_compat, stride=s,
                closing_ksize=0, compute_dtype=cdt,
            ).astype(jnp.int32)
        return _mean_field_binary(
            du, rgb, num_iters=num_iters, gaussian_sxy=gaussian_sxy,
            gaussian_compat=gaussian_compat, bilateral_sxy=bilateral_sxy,
            bilateral_srgb=bilateral_srgb, bilateral_compat=bilateral_compat,
            s=s, cdt=cdt, impl=impl,
        )

    if compute_dtype != "auto" and bilateral_impl != "auto":
        return _run(jnp.dtype(compute_dtype), bilateral_impl)
    # 'auto' choices are resolved per LOWERING PLATFORM
    # (lax.platform_dependent), not by the tracing host's backend: a serving
    # artifact exported from a CPU host with platforms=('tpu',) bakes the
    # same bf16/kernel path live TPU eval takes, so serving.py's
    # served-equals-evaluated guarantee holds regardless of which host
    # staged the export. Non-TPU lowerings statically resolve to the exact
    # f32 xla branch (the numpy-parity configuration).
    return jax.lax.platform_dependent(
        tpu=lambda: _run(
            _resolve_compute_dtype(compute_dtype, True),
            _resolve_bilateral_impl(bilateral_impl, h, w, s, True),
        ),
        default=lambda: _run(
            _resolve_compute_dtype(compute_dtype, False),
            _resolve_bilateral_impl(bilateral_impl, h, w, s, False),
        ),
    )


def _mean_field_binary(
    du_f32, rgb, *, num_iters, gaussian_sxy, gaussian_compat, bilateral_sxy,
    bilateral_srgb, bilateral_compat, s, cdt, impl,
):
    bb, kk, h, w = du_f32.shape
    # Binary-label reduction: with labels {bg, fg} and symmetric
    # normalization, the full 2-channel mean-field update
    #     q' = softmax(-u + w K q)        (per label)
    # depends only on the per-pixel difference. Carrying
    #     d = q_fg - q_bg in [-1, 1]
    # the update becomes d' = tanh((du + w K d) / 2), where
    #     du = u_bg - u_fg = log(p+eps) - log(1-p+eps)
    # (since softmax over 2 labels is a sigmoid of the logit difference and
    # sigmoid(x)*2-1 = tanh(x/2)). This halves every fine-grid tensor and
    # the kernel matmul width versus the generic L-label formulation; the
    # fixed point is identical (verified against the 2-channel numpy
    # mean-field in tests).
    du = du_f32.astype(cdt)

    taps = jnp.asarray(_gaussian_taps(gaussian_sxy))

    # Gaussian normalization: D = blur(1); symmetric norm 1/sqrt(D)
    ones = jnp.ones((h, w), jnp.float32)
    g_norm = jax.lax.rsqrt(_sep_blur(ones, taps) + 1e-20).astype(cdt)  # (H, W)
    taps = taps.astype(cdt)

    # bilateral kernel features at coarse resolution (per image, shared
    # across the K candidate maps)
    rgb_small = _box_downsample(
        jnp.moveaxis(rgb.astype(jnp.float32), -1, 1), s
    )  # (B, 3, h/s, w/s)
    rgb_small = jnp.moveaxis(rgb_small, 1, -1)  # (B, h/s, w/s, 3)
    n_small = (h // s) * (w // s)

    if impl == "pallas":
        from simseg_tpu.ops.crf_pallas import (
            bilateral_features,
            bilateral_matvec_batched,
        )

        feat = jax.vmap(
            lambda r: bilateral_features(r, bilateral_sxy, bilateral_srgb, s)
        )(rgb_small)  # (B, n_small, 5)
        degree = bilateral_matvec_batched(
            feat, jnp.ones((bb, n_small, 1), jnp.float32)
        )
        b_norm = jax.lax.rsqrt(degree[..., 0] + 1e-20).astype(cdt)  # (B, n_small)

        def _bilateral_apply(q_small: jnp.ndarray) -> jnp.ndarray:
            # q_small: (B, C, n_small) -> (B, C, n_small)
            qn = (q_small * b_norm[:, None, :]).transpose(0, 2, 1)
            m = bilateral_matvec_batched(feat, qn).transpose(0, 2, 1)
            return m.astype(cdt) * b_norm[:, None, :]
    else:
        kmat = jax.vmap(
            lambda r: _bilateral_kernel_matrix(r, bilateral_sxy,
                                               bilateral_srgb, s)
        )(rgb_small)  # (B, n_small, n_small)
        b_norm = jax.lax.rsqrt(jnp.sum(kmat, axis=2) + 1e-20)  # (B, n_small)
        kmat = kmat.astype(cdt)
        b_norm = b_norm.astype(cdt)

        def _bilateral_apply(q_small: jnp.ndarray) -> jnp.ndarray:
            m = jnp.einsum(
                "bcn,bmn->bcm", q_small * b_norm[:, None, :], kmat,
                preferred_element_type=jnp.float32,
            ).astype(cdt)
            return m * b_norm[:, None, :]

    def bilateral_message(d: jnp.ndarray) -> jnp.ndarray:
        """d: (B, K, H, W) -> normalized bilateral message on the label
        difference, via mean-splat -> (streaming kernel | kernel matrix) ->
        nearest slice.

        Normalization note: the fine-grid degree is D_i = s^2 (K 1)_c, so the
        two D^{-1/2} factors contribute 1/s^2, exactly cancelling the s^2 of
        a sum-splat — i.e. mean-splat with coarse-degree normalization is the
        correct discretization (verified against the exact stride-1 kernel in
        tests)."""
        d_small = _box_downsample(d, s).reshape(bb, kk, n_small)
        m = _bilateral_apply(d_small)
        m = m.reshape(bb, kk, h // s, w // s)
        # slice: nearest upsample back to fine grid (single broadcast pass)
        from simseg_tpu.ops.morphology import nearest_upsample

        return nearest_upsample(m, s)

    def gaussian_message(d: jnp.ndarray) -> jnp.ndarray:
        dn = d * g_norm
        m = _sep_blur(dn, taps)
        return m * g_norm

    def body(_, d):
        m = gaussian_compat * gaussian_message(d) + bilateral_compat * bilateral_message(d)
        return jnp.tanh((du + m) * 0.5)

    d0 = jnp.tanh(du * 0.5)
    d = jax.lax.fori_loop(0, num_iters, body, d0)
    return (d > 0).astype(jnp.int32)


def dense_crf_binary(probs: jnp.ndarray, rgb: jnp.ndarray, **kwargs) -> jnp.ndarray:
    """Single-image wrapper: probs (K, H, W), rgb (H, W, 3) ->
    (K, H, W) int32 masks."""
    return dense_crf_batched(probs[None], rgb[None], **kwargs)[0]
