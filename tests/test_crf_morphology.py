"""On-device CRF and morphology vs exact numpy mean-field and cv2."""

import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from simseg_tpu.ops.crf import dense_crf_binary
from simseg_tpu.ops.morphology import (
    closing,
    cv2_nearest_indices,
    dilate,
    erode,
    nearest_upsample,
    resize_nearest_to_padded,
)


def np_dense_crf(probs, rgb, iters=3, g_sxy=3.0, g_compat=3.0,
                 b_sxy=40.0, b_srgb=13.0, b_compat=10.0):
    """Exact brute-force mean-field dense CRF (Krähenbühl), symmetric kernel
    normalization, self-interaction included — the ground truth for the TPU
    kernel at stride 1."""
    h, w = probs.shape
    n = h * w
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    pos = np.stack([yy.ravel(), xx.ravel()], 1)

    def kernel(feat):
        d2 = ((feat[:, None, :] - feat[None, :, :]) ** 2).sum(-1)
        return np.exp(-0.5 * d2)

    kg = kernel(pos / g_sxy)
    fb = np.concatenate([pos / b_sxy, rgb.reshape(n, 3) / b_srgb], 1)
    kb = kernel(fb)
    ng = 1.0 / np.sqrt(kg.sum(1) + 1e-20)
    nb = 1.0 / np.sqrt(kb.sum(1) + 1e-20)

    p = probs.reshape(n)
    u = -np.log(np.stack([1 - p, p], 0) + 1e-8)  # (2, N)

    def softmax(x):
        e = np.exp(x - x.max(0, keepdims=True))
        return e / e.sum(0, keepdims=True)

    q = softmax(-u)
    for _ in range(iters):
        mg = (ng[:, None] * (kg @ (ng[:, None] * q.T))).T
        mb = (nb[:, None] * (kb @ (nb[:, None] * q.T))).T
        q = softmax(-u + g_compat * mg + b_compat * mb)
    return np.argmax(q, 0).reshape(h, w)


@pytest.mark.parametrize("seed", [0, 1])
def test_crf_matches_exact_numpy_at_stride1(seed):
    rng = np.random.default_rng(seed)
    h = w = 16
    # two-region image with noisy probability map
    rgb = np.zeros((h, w, 3), np.float64)
    rgb[:, : w // 2] = [200, 30, 40]
    rgb[:, w // 2:] = [20, 180, 220]
    rgb += rng.normal(0, 5, rgb.shape)
    probs = np.clip(
        0.5 + 0.35 * np.where(np.arange(w) < w // 2, 1.0, -1.0)[None, :]
        + rng.normal(0, 0.15, (h, w)),
        0.01, 0.99,
    )
    want = np_dense_crf(probs, rgb)
    got = np.asarray(
        dense_crf_binary(
            jnp.asarray(probs[None]), jnp.asarray(rgb), bilateral_stride=1
        )[0]
    )
    agreement = (got == want).mean()
    assert agreement == 1.0, f"agreement {agreement}"


def test_crf_stride4_approximates_stride1():
    rng = np.random.default_rng(2)
    h = w = 32
    rgb = np.zeros((h, w, 3), np.float64)
    rgb[: h // 2] = [180, 60, 60]
    rgb[h // 2:] = [40, 160, 90]
    rgb += rng.normal(0, 8, rgb.shape)
    probs = np.clip(
        0.5 + 0.3 * np.where(np.arange(h) < h // 2, 1.0, -1.0)[:, None]
        + rng.normal(0, 0.2, (h, w)),
        0.01, 0.99,
    )
    exact = np.asarray(
        dense_crf_binary(jnp.asarray(probs[None]), jnp.asarray(rgb),
                         bilateral_stride=1)[0]
    )
    approx = np.asarray(
        dense_crf_binary(jnp.asarray(probs[None]), jnp.asarray(rgb),
                         bilateral_stride=4)[0]
    )
    assert (exact == approx).mean() >= 0.97


def test_crf_du_entry_matches_probs_entry():
    """dense_crf_batched_du(log(p)-log(1-p)) == dense_crf_batched(p): the
    coarse-unary rearrangement the seg decode uses must be bit-identical."""
    from simseg_tpu.ops.crf import dense_crf_batched, dense_crf_batched_du
    from simseg_tpu.ops.morphology import nearest_upsample

    rng = np.random.default_rng(7)
    coarse = rng.uniform(0.0, 1.0, (2, 3, 8, 8)).astype(np.float32)
    probs = np.asarray(nearest_upsample(jnp.asarray(coarse), 4))  # (2,3,32,32)
    rgb = jnp.asarray(rng.integers(0, 255, (2, 32, 32, 3)).astype(np.uint8))

    via_probs = dense_crf_batched(jnp.asarray(probs), rgb, bilateral_stride=4)
    p = np.clip(coarse, 0.0, 1.0)
    du_coarse = np.log(p + 1e-8) - np.log(1.0 - p + 1e-8)
    du = nearest_upsample(jnp.asarray(du_coarse), 4)
    via_du = dense_crf_batched_du(du, rgb, bilateral_stride=4)
    assert np.array_equal(np.asarray(via_probs), np.asarray(via_du))


def test_crf_sharpens_noisy_mask():
    """CRF should clean salt-and-pepper noise inside color-coherent regions."""
    rng = np.random.default_rng(3)
    h = w = 32
    gt = np.zeros((h, w), bool)
    gt[8:24, 8:24] = True
    rgb = np.where(gt[..., None], [210.0, 40.0, 40.0], [30.0, 30.0, 200.0])
    noisy = np.clip(gt * 0.8 + 0.1 + rng.normal(0, 0.25, (h, w)), 0.01, 0.99)
    refined = np.asarray(
        dense_crf_binary(jnp.asarray(noisy[None]), jnp.asarray(rgb),
                         bilateral_stride=4)[0]
    ).astype(bool)
    base_err = ((noisy > 0.5) != gt).mean()
    crf_err = (refined != gt).mean()
    assert crf_err < base_err
    assert crf_err < 0.02


def test_dilate_erode_match_cv2():
    rng = np.random.default_rng(4)
    mask = (rng.random((33, 47)) > 0.8).astype(np.uint8) * 255
    kernel = np.ones((7, 7), np.uint8)
    want_d = cv2.dilate(mask, kernel)
    want_e = cv2.erode(mask, kernel)
    got_d = np.asarray(dilate(jnp.asarray(mask.astype(np.float32)), 7))
    got_e = np.asarray(erode(jnp.asarray(mask.astype(np.float32)), 7))
    np.testing.assert_array_equal(got_d.astype(np.uint8), want_d)
    np.testing.assert_array_equal(got_e.astype(np.uint8), want_e)

    want_close = cv2.erode(cv2.dilate(mask, kernel), kernel)
    got_close = np.asarray(closing(jnp.asarray(mask.astype(np.float32)), 7))
    np.testing.assert_array_equal(got_close.astype(np.uint8), want_close)


def test_binary_closing_matmul_matches_reduce_window():
    """The MXU band-matmul closing must equal the reduce_window closing on
    0/1 masks, for every dtype the decode uses and both ksize parities."""
    from simseg_tpu.ops.morphology import binary_closing_matmul, closing

    rng = np.random.default_rng(11)
    for shape in [(2, 3, 24, 24), (1, 1, 17, 29)]:
        mask = (rng.random(shape) > 0.7)
        for dtype in (np.float32, jnp.bfloat16):
            x = jnp.asarray(mask).astype(dtype)
            for k in (7, 3, 4):
                # jit like the decode does (the CPU backend's EAGER bf16
                # transposed-dot path is unsupported; compiled it is fine)
                want = np.asarray(jax.jit(closing, static_argnums=1)(
                    x, k).astype(np.float32))
                got = np.asarray(jax.jit(
                    binary_closing_matmul, static_argnums=1)(
                    x, k).astype(np.float32))
                assert np.array_equal(want, got), (shape, dtype, k)


def test_nearest_upsample_matches_torch():
    rng = np.random.default_rng(5)
    x = rng.normal(size=(2, 3, 6, 6)).astype(np.float32)
    got = np.asarray(nearest_upsample(jnp.asarray(x), 4))
    want = F.interpolate(torch.tensor(x), scale_factor=4, mode="nearest").numpy()
    np.testing.assert_array_equal(got, want)


def test_cv2_nearest_indices_match_cv2_resize():
    rng = np.random.default_rng(6)
    src = rng.integers(0, 255, (18, 24)).astype(np.uint8)
    for out_h, out_w in [(13, 50), (36, 7), (100, 100)]:
        want = cv2.resize(src, (out_w, out_h), interpolation=cv2.INTER_NEAREST)
        iy = cv2_nearest_indices(18, out_h)
        ix = cv2_nearest_indices(24, out_w)
        got = src[iy[:, None], ix[None, :]]
        np.testing.assert_array_equal(got, want)


def test_resize_nearest_to_padded():
    src = jnp.asarray(np.arange(16).reshape(4, 4).astype(np.int32))
    out = np.asarray(
        resize_nearest_to_padded(src, jnp.asarray(8), jnp.asarray(8), 10, 10,
                                 fill=255)
    )
    want = cv2.resize(np.arange(16).reshape(4, 4).astype(np.uint8), (8, 8),
                      interpolation=cv2.INTER_NEAREST)
    np.testing.assert_array_equal(out[:8, :8].astype(np.uint8), want)
    assert np.all(out[8:] == 255) and np.all(out[:, 8:] == 255)


def test_crf_stride8_approximates_stride4_at_scale():
    """The seg-eval default stride is 8 (finer than pydensecrf's
    permutohedral lattice, whose effective spatial cell is ~1 sigma = 40px);
    regression-guard its agreement with stride 4 on a structured scene.
    Measured at 288px on TPU: 98.5% mean agreement; at this smaller test
    size stride-8 cells are relatively coarser, so the bound is looser."""
    rng = np.random.default_rng(7)
    h = w = 96
    img = np.zeros((h, w, 3), np.float32)
    img[:] = [40, 40, 180]
    yy, xx = np.mgrid[0:h, 0:w]
    gt = ((yy - 48) / 28) ** 2 + ((xx - 44) / 32) ** 2 < 1
    img[gt] = [200, 60, 50]
    img = np.clip(img + rng.normal(0, 6, img.shape), 0, 255)
    g = h // 16
    pg = np.clip(0.55 * gt.reshape(g, 16, g, 16).mean((1, 3)) + 0.25
                 + rng.normal(0, 0.12, (g, g)), 0.01, 0.99)
    probs = np.repeat(np.repeat(pg, 16, 0), 16, 1)[None]
    m4 = np.asarray(dense_crf_binary(jnp.asarray(probs), jnp.asarray(img),
                                     bilateral_stride=4))
    m8 = np.asarray(dense_crf_binary(jnp.asarray(probs), jnp.asarray(img),
                                     bilateral_stride=8))
    assert (m4 == m8).mean() >= 0.95


def test_crf_auto_knobs_resolve_per_lowering_platform():
    """The 'auto' compute-dtype / bilateral-impl knobs must be resolved by
    the LOWERING platform, not the tracing host's backend: a serving
    artifact exported from a CPU host with platforms=('tpu',) has to bake
    the same bf16 lane live TPU eval runs (ADVICE round-2 class of bug —
    see ops/attention.py's flash gating for the same pattern)."""
    import jax
    from jax import export as jexport

    from simseg_tpu.ops.crf import dense_crf_batched

    probs = jnp.zeros((1, 2, 32, 32), jnp.float32)
    rgb = jnp.zeros((1, 32, 32, 3), jnp.float32)

    def fn(p, r):
        return dense_crf_batched(p, r, bilateral_stride=4)

    tpu_mod = jexport.export(jax.jit(fn), platforms=("tpu",))(
        probs, rgb).mlir_module()
    cpu_mod = jexport.export(jax.jit(fn), platforms=("cpu",))(
        probs, rgb).mlir_module()
    assert "bf16" in tpu_mod      # TPU lane: bf16 fine-grid compute
    assert "bf16" not in cpu_mod  # CPU lane: exact f32 (numpy parity config)
