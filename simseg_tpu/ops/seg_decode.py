"""Fused on-device zero-shot segmentation decode.

Parity: the reference's per-image eval loop ``tools/seg_evaluation.py:93-177``:
1. global image-text scores -> top-k class shortlist; adaptive threshold
   mean + 1.0 * std of the top-k scores (:119-124, torch.std = ddof 1)
2. up to 5 candidate classes (skip background id 0 / 255; scores below the
   threshold are dropped — the reference breaks out of the sorted loop,
   which filters the same set) (:129-147)
3. per candidate: patch-token/class-text similarity map (18x18) -> x16
   nearest upsample -> min-max normalize (:136-150)
4. dense-CRF binary refinement on the raw image (:153, pydensecrf on CPU in
   the reference; here the on-device mean-field kernel from ops/crf.py)
5. 7x7 dilate + erode, nearest resize, score-weighted stack, argmax
   (:156-162, cv2 on CPU in the reference)

Everything below runs in ONE jit over a whole image batch; the only
data-dependent control flow (candidate count) is handled with a fixed
budget of 5 masked candidates (SURVEY.md §7 hard-part 5).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from simseg_tpu.ops.crf import dense_crf_batched_du
from simseg_tpu.ops.morphology import (
    binary_closing_matmul,
    closing,
    nearest_upsample,
)


def make_seg_decode_fn(
    num_classes: int,
    image_size: int,
    patch_size: int = 16,
    top_cls_num: int = 10,
    candidate_classes: int = 5,
    crf_iters: int = 3,
    bilateral_stride: int = 8,
    morphology_ksize: int = 7,
    morphology_impl: str = "auto",
    crf_backend: str = "auto",
    compute_dtype: str = "auto",
):
    """Build the jitted decode fn.

    Returned fn(dense, pooled, text_bank, raw_images) ->
        (pred, best_weight) where
        dense:      (B, N, D) per-token projected embeddings, L2-normalized
        pooled:     (B, D) global image embedding, L2-normalized
        text_bank:  (C, D) class text embeddings, L2-normalized
        raw_images: (B, H, W, 3) uint8 original-scale pixels
        pred:       (B, H, W) int32 class map (0 = background)
        best_weight:(B, H, W) float32 winning score*mask weight (0 where bg)
    """
    grid = image_size // patch_size
    # the shortlist can't exceed the label bank, nor the candidate budget
    # the shortlist (small banks in tests / custom datasets)
    top_cls_num = min(top_cls_num, num_classes)
    candidate_classes = min(candidate_classes, top_cls_num)

    @jax.jit
    def decode(dense, pooled, text_bank, raw_images):
        b, n, d = dense.shape
        assert n == grid * grid, (n, grid)

        # 1. shortlist + threshold (:119-124)
        scores = jnp.einsum("bd,cd->bc", pooled, text_bank,
                            preferred_element_type=jnp.float32)
        topk_scores, topk_idx = jax.lax.top_k(scores, top_cls_num)
        mean = jnp.mean(topk_scores, axis=-1)
        std = jnp.std(topk_scores, axis=-1, ddof=1)
        threshold = mean + 1.0 * std

        cand_idx = topk_idx[:, :candidate_classes]           # (B, K)
        cand_scores = topk_scores[:, :candidate_classes]     # (B, K)
        valid = (
            (cand_idx != 0)
            & (cand_idx != 255)
            & (cand_scores >= threshold[:, None])
        )

        # 2. similarity maps (:136-139)
        cand_emb = text_bank[cand_idx]                        # (B, K, D)
        attn = jnp.einsum("bnd,bkd->bkn", dense, cand_emb,
                          preferred_element_type=jnp.float32)
        attn = attn.reshape(b, candidate_classes, grid, grid)

        # 3. min-max normalize per map (:149-150). Normalization commutes
        # with the nearest upsample, so it runs on the coarse grid (256x
        # fewer elements in the reductions).
        amin = jnp.min(attn, axis=(-2, -1), keepdims=True)
        amax = jnp.max(attn, axis=(-2, -1), keepdims=True)
        probs = (attn - amin) / jnp.maximum(amax - amin, 1e-12)

        # 4. CRF refinement, one shared bilateral kernel per image (:153).
        # The unary difference log(p)-log(1-p) is elementwise, so it too is
        # computed on the coarse grid and nearest-upsampled — bit-identical
        # to upsampling the probabilities first, without ever materializing
        # a fine-grid f32 probability tensor.
        p = jnp.clip(probs, 0.0, 1.0)
        du_coarse = jnp.log(p + 1e-8) - jnp.log(1.0 - p + 1e-8)

        # 5. morphology + score weighting + argmax (:156-177). Fine-grid
        # tensors ride the CRF's compute dtype (bf16 on TPU — masks are 0/1
        # so the separable min/max closing is exact; the score weighting
        # decision is a strict ordering of a handful of scores, done in f32)
        # impl knob: 'window' = separable lax.reduce_window max/min passes;
        # 'matmul' = banded-matmul count closing on the MXU (exact on the
        # CRF's 0/1 masks — ops/morphology.binary_closing_matmul). 'auto'
        # resolves per LOWERING platform (like the CRF's auto knobs, so
        # cross-platform serving exports bake the right lane per target):
        # matmul on TPU, window elsewhere. bf16 vs f32 closing is
        # bit-identical on 0/1 masks, so both knobs are pure speed choices.
        def _tail(masks_f):
            """weights -> argmax -> class select (shared by every lane)."""
            weights = jnp.where(
                valid[:, :, None, None],
                masks_f * cand_scores[:, :, None, None],
                0.0,
            )
            best_k = jnp.argmax(weights, axis=1)              # (B, H, W)
            best_w = jnp.max(weights, axis=1)
            # class lookup via arithmetic select over the tiny K dim (a
            # gather along a middle axis lowers poorly on TPU: ~11ms -> ~0
            # for batch 16)
            pred = jnp.zeros((b, image_size, image_size), jnp.int32)
            for k in range(candidate_classes):
                pred = jnp.where(best_k == k, cand_idx[:, k, None, None],
                                 pred)
            pred = jnp.where(best_w > 0, pred, 0).astype(jnp.int32)
            return pred, best_w

        def _unfused(on_tpu):
            du = nearest_upsample(du_coarse, patch_size)       # (B, K, H, W)
            masks = dense_crf_batched_du(
                du, raw_images, num_iters=crf_iters,
                bilateral_stride=bilateral_stride,
                bilateral_impl=crf_backend,
                compute_dtype=compute_dtype,
            )                                                  # (B, K, H, W)
            impl = (morphology_impl if morphology_impl != "auto"
                    else ("matmul" if on_tpu else "window"))
            cdt = (jnp.dtype(compute_dtype) if compute_dtype != "auto"
                   else (jnp.bfloat16 if on_tpu else jnp.float32))
            op = binary_closing_matmul if impl == "matmul" else closing
            return _tail(op(masks.astype(cdt), morphology_ksize).astype(
                jnp.float32))

        from simseg_tpu.ops.crf_fused import (
            fused_eligible,
            mean_field_fused,
            seg_decode_tail_fused,
        )

        def _cdt():
            return (jnp.dtype(compute_dtype) if compute_dtype != "auto"
                    else jnp.bfloat16)

        # OPT-IN full-tail kernel (crf_backend='fused_tail'): CRF + closing
        # + score-weighted argmax all in one Pallas kernel
        # (seg_decode_tail_fused). Bit-identical to the unfused chain when
        # called standalone AND in replicated pipelines, but the round-5
        # hardware session measured a deterministic in-situ divergence in
        # THIS decode (87-79% pred agreement vs the xla lane on parity
        # scenes) that every attempted minimal reproduction — same data,
        # same nesting, same platform_dependent structure, heavy default
        # branch, inner jit — fails to reproduce (100% everywhere). Until
        # that is root-caused the certified TPU lane fuses CRF+closing only.
        if (crf_backend == "fused_tail"
                and fused_eligible(image_size, image_size, bilateral_stride)):
            def _fused_tail_tpu():
                scores_eff = jnp.where(valid, cand_scores, 0.0).astype(
                    jnp.float32)
                return seg_decode_tail_fused(
                    du_coarse, raw_images, scores_eff,
                    cand_idx.astype(jnp.int32),
                    du_factor=patch_size, num_iters=crf_iters,
                    stride=bilateral_stride,
                    closing_ksize=morphology_ksize,
                    compute_dtype=_cdt(),
                )

            return jax.lax.platform_dependent(
                tpu=_fused_tail_tpu,
                default=lambda: _unfused(False),
            )

        # Default TPU lane: the mean-field loop AND the closing run in one
        # Pallas kernel (ops/crf_fused.py mean_field_fused — kernel matrix
        # built in VMEM, d resident across all iterations, banded-matmul
        # closing before masks leave the chip); the score-weighting/argmax
        # tail stays XLA. In-pipeline verified against the xla lane on the
        # real parity scenes (99.9% mask agreement) and certified by
        # tools/seg_parity.py. Knob gating: both the CRF backend and
        # morphology impl left on 'auto' (pinned knobs keep the separate
        # stages for A/B lanes).
        if (crf_backend == "auto" and morphology_impl == "auto"
                and fused_eligible(image_size, image_size, bilateral_stride)):
            def _fused_tpu():
                du = nearest_upsample(du_coarse, patch_size)
                masks_f = mean_field_fused(
                    du, raw_images, num_iters=crf_iters,
                    stride=bilateral_stride,
                    closing_ksize=morphology_ksize,
                    compute_dtype=_cdt(),
                ).astype(jnp.float32)
                return _tail(masks_f)

            return jax.lax.platform_dependent(
                tpu=_fused_tpu,
                default=lambda: _unfused(False),
            )
        if morphology_impl == "auto" or compute_dtype == "auto":
            return jax.lax.platform_dependent(
                tpu=lambda: _unfused(True),
                default=lambda: _unfused(False),
            )
        # both knobs pinned: on_tpu only affects 'auto' resolution
        return _unfused(False)

    return decode
