"""Fused single-kernel mean-field CRF (ops/crf_fused.py) vs ground truth.

The fused kernel is the TPU decode's default CRF+closing lane (auto-resolved
in ops/crf.py::_resolve_bilateral_impl / ops/seg_decode.py); these tests run
it in Pallas interpret mode on CPU against (a) the exact brute-force numpy
mean-field at stride 1 and (b) the XLA lane it replaces.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simseg_tpu.ops.crf import dense_crf_batched_du
from simseg_tpu.ops.crf_fused import fused_eligible, mean_field_fused
from simseg_tpu.ops.morphology import binary_closing_matmul

from tests.test_crf_morphology import np_dense_crf


def _du(p):
    p = np.clip(p, 0.0, 1.0)
    return (np.log(p + 1e-8) - np.log(1.0 - p + 1e-8)).astype(np.float32)


@pytest.mark.parametrize("seed", [0, 1])
def test_fused_matches_exact_numpy_at_stride1(seed):
    rng = np.random.default_rng(seed)
    h = w = 16
    rgb = np.zeros((h, w, 3))
    rgb[:, : w // 2] = [200, 30, 40]
    rgb[:, w // 2:] = [20, 180, 220]
    rgb += rng.normal(0, 5, rgb.shape)
    probs = np.clip(
        0.5 + 0.35 * np.where(np.arange(w) < w // 2, 1.0, -1.0)[None, :]
        + rng.normal(0, 0.15, (h, w)),
        0.01, 0.99,
    )
    want = np_dense_crf(probs, rgb)
    got = np.asarray(mean_field_fused(
        jnp.asarray(_du(probs)[None, None]),
        jnp.asarray(rgb[None].astype(np.float32)),
        stride=1, compute_dtype=jnp.float32, interpret=True,
    ))[0, 0]
    assert (got.astype(np.int64) == want).mean() == 1.0


def test_fused_matches_xla_lane_at_coarse_stride():
    """Same masks as the materialized-kernel XLA lane (up to f32 rounding
    from the folded gaussian normalization at threshold-marginal pixels)."""
    rng = np.random.default_rng(3)
    b, k, h, w = 2, 3, 32, 32
    p = rng.uniform(0.02, 0.98, (b, k, h, w))
    du = jnp.asarray(_du(p))
    rgb = jnp.asarray(rng.integers(0, 255, (b, h, w, 3)).astype(np.float32))

    want = np.asarray(dense_crf_batched_du(
        du, rgb, bilateral_stride=4, bilateral_impl="xla",
        compute_dtype="float32"))
    got = np.asarray(mean_field_fused(
        du, rgb, stride=4, compute_dtype=jnp.float32, interpret=True))
    assert (want == got.astype(np.int32)).mean() >= 0.995


def test_fused_closing_matches_separate_closing():
    """closing_ksize>1 must equal running the banded-matmul closing on the
    kernel's own unclosed masks (the decode's fusion contract)."""
    rng = np.random.default_rng(5)
    b, k, h, w = 2, 2, 32, 32
    p = rng.uniform(0.02, 0.98, (b, k, h, w))
    du = jnp.asarray(_du(p))
    rgb = jnp.asarray(rng.integers(0, 255, (b, h, w, 3)).astype(np.float32))

    raw = mean_field_fused(du, rgb, stride=4, compute_dtype=jnp.float32,
                           interpret=True)
    want = np.asarray(jax.jit(binary_closing_matmul, static_argnums=1)(
        raw.astype(jnp.float32), 7))
    got = np.asarray(mean_field_fused(
        du, rgb, stride=4, closing_ksize=7, compute_dtype=jnp.float32,
        interpret=True))
    np.testing.assert_array_equal(want, got)


def test_fused_zero_iters_is_unary_threshold():
    rng = np.random.default_rng(7)
    p = rng.uniform(0.02, 0.98, (1, 2, 16, 16))
    du = jnp.asarray(_du(p))
    rgb = jnp.asarray(rng.integers(0, 255, (1, 16, 16, 3)).astype(np.float32))
    got = np.asarray(mean_field_fused(
        du, rgb, num_iters=0, stride=4, compute_dtype=jnp.float32,
        interpret=True))
    np.testing.assert_array_equal(got, (np.asarray(du) > 0).astype(np.float32))


def test_fused_eligibility_gate():
    assert fused_eligible(288, 288, 8)        # the production decode shape
    assert fused_eligible(288, 288, 16)
    assert not fused_eligible(288, 288, 4)    # N=5184: kmat exceeds VMEM
    assert not fused_eligible(287, 288, 8)    # not stride-divisible


def test_auto_resolution_prefers_fused_on_tpu():
    from simseg_tpu.ops.crf import _resolve_bilateral_impl

    assert _resolve_bilateral_impl("auto", 288, 288, 8, True) == "fused"
    assert _resolve_bilateral_impl("auto", 288, 288, 6, True) == "xla"
    assert _resolve_bilateral_impl("auto", 288, 288, 4, True) == "pallas"
    assert _resolve_bilateral_impl("auto", 288, 288, 8, False) == "xla"
    assert _resolve_bilateral_impl("pallas", 288, 288, 8, True) == "pallas"


def test_decode_tail_kernel_matches_unfused_chain():
    """seg_decode_tail_fused == [mean_field_fused masks -> XLA weights ->
    argmax -> class select] bit-for-bit: both run the same in-kernel CRF,
    so the tail fusion (in-VMEM coarse-unary upsample, running score-
    weighted argmax) must be EXACTLY the unfused chain, including invalid
    candidates (score 0), negative scores, and argmax's first-occurrence
    tie rule."""
    from simseg_tpu.ops.crf_fused import seg_decode_tail_fused
    from simseg_tpu.ops.morphology import nearest_upsample

    rng = np.random.default_rng(11)
    b, k, gh, f, s = 2, 4, 8, 4, 4          # 32x32 fine grid
    h = gh * f
    du_c = jnp.asarray(
        rng.normal(0.0, 3.0, (b, k, gh, gh)).astype(np.float32))
    rgb = jnp.asarray(rng.integers(0, 255, (b, h, h, 3)).astype(np.float32))
    # scores: one invalid (0), one negative, one duplicated (tie exercise)
    scores = np.array([[0.0, 0.31, 0.31, -0.2],
                       [0.5, 0.0, 0.25, 0.25]], np.float32)
    cand_idx = np.array([[3, 7, 1, 2], [4, 0, 9, 6]], np.int32)

    du_fine = nearest_upsample(du_c, f)
    masks = mean_field_fused(du_fine, rgb, stride=s, closing_ksize=7,
                             compute_dtype=jnp.float32, interpret=True)
    weights = masks.astype(jnp.float32) * scores[:, :, None, None]
    best_k = jnp.argmax(weights, axis=1)
    bw_ref = jnp.max(weights, axis=1)
    pred_ref = jnp.zeros((b, h, h), jnp.int32)
    for kk in range(k):
        pred_ref = jnp.where(best_k == kk, cand_idx[:, kk, None, None],
                             pred_ref)
    pred_ref = jnp.where(bw_ref > 0, pred_ref, 0)

    pred, bw = seg_decode_tail_fused(
        du_c, rgb, jnp.asarray(scores), jnp.asarray(cand_idx),
        du_factor=f, stride=s, closing_ksize=7,
        compute_dtype=jnp.float32, interpret=True)
    np.testing.assert_array_equal(np.asarray(pred), np.asarray(pred_ref))
    np.testing.assert_array_equal(np.asarray(bw), np.asarray(bw_ref))


def test_seg_decode_tpu_export_bakes_fused_kernel():
    """Cross-platform serving: exporting the decode for platforms=('tpu',)
    from a CPU host must stage the fused Mosaic kernel (the lane live TPU
    eval runs), while the CPU lowering stays kernel-free XLA."""
    from jax import export as jexport

    from simseg_tpu.ops.seg_decode import make_seg_decode_fn

    decode = make_seg_decode_fn(5, 32, 8, 3, 3, bilateral_stride=4)
    args = (
        jax.ShapeDtypeStruct((2, 16, 32), jnp.float32),
        jax.ShapeDtypeStruct((2, 32), jnp.float32),
        jax.ShapeDtypeStruct((5, 32), jnp.float32),
        jax.ShapeDtypeStruct((2, 32, 32, 3), jnp.uint8),
    )
    tpu_mod = jexport.export(jax.jit(decode), platforms=("tpu",))(
        *args).mlir_module()
    assert "tpu_custom_call" in tpu_mod
    cpu_mod = jexport.export(jax.jit(decode), platforms=("cpu",))(
        *args).mlir_module()
    assert "tpu_custom_call" not in cpu_mod


def test_fused_multiblock_kmat_build():
    """N > 512 exercises the blocked kernel-matrix build loop (the
    production stride-8 shape builds 9 blocks of 144 rows); agreement with
    the XLA lane like the single-block case."""
    rng = np.random.default_rng(13)
    b, k, h, w = 1, 2, 96, 96                      # N = 576 -> blk 192
    p = rng.uniform(0.02, 0.98, (b, k, h, w))
    du = jnp.asarray(_du(p))
    rgb = jnp.asarray(rng.integers(0, 255, (b, h, w, 3)).astype(np.float32))
    want = np.asarray(dense_crf_batched_du(
        du, rgb, bilateral_stride=4, bilateral_impl="xla",
        compute_dtype="float32"))
    got = np.asarray(mean_field_fused(
        du, rgb, stride=4, compute_dtype=jnp.float32, interpret=True))
    assert (want == got.astype(np.int32)).mean() >= 0.995
