"""Headline benchmark: zero-shot segmentation inference throughput
(images/sec/chip) for the flagship ViT-B/16 pipeline at 288px.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline anchor: the PyTorch reference runs DenseCRF (pydensecrf, CPU) +
OpenCV morphology per candidate class per image serially on the host
(tools/seg_evaluation.py:153-161), which bounds its throughput regardless
of GPU speed. The denominator is MEASURED by tools/measure_baseline.py: a
native C++ re-derivation of the reference's mean-field CRF (same params,
same splat-blur-slice approximation family as pydensecrf's permutohedral
lattice, validated 100% against the exact O(N^2) mean-field) plus the real
cv2 morphology/resize calls, at 288^2, assuming the MINIMUM 1 refined class
per image (the reference caps at 5) — i.e. an upper bound on the
reference's img/s, making vs_baseline conservative. bench.py re-measures
on the current host when a C++ toolchain is present, else uses the figure
recorded in BASELINE.md (21.1 img/s, measured 2026-08-16).
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

# Persistent XLA compilation cache: the quantized/token-merged lanes compile
# 12 distinct per-block graphs (ToMe changes T every block), which on the
# tunneled chip can take minutes on a cold process. The cache makes every
# bench invocation after the first fast. Harmless where unsupported.
try:
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("JAX_COMPILATION_CACHE_DIR",
                       os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                    ".jax_cache")),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

# measured fallback (tools/measure_baseline.py on the round-2 bench host)
REFERENCE_IMAGES_PER_SEC_MEASURED = 21.1


def reference_rate() -> float:
    """Re-measure the reference's host-decode bound on this machine; fall
    back to the recorded measurement. The MAX of the two is used so a
    CPU-contended re-measurement (which would slow the reference stand-in
    and inflate vs_baseline) can only make the comparison MORE
    conservative, never less."""
    try:
        sys.path.insert(0, os.path.join(os.path.dirname(
            os.path.abspath(__file__)), "tools"))
        from measure_baseline import build_native, measure

        crf = build_native()
        if crf is None:
            return REFERENCE_IMAGES_PER_SEC_MEASURED
        out = measure(trials=5, crf=crf)
        return max(float(out["reference_img_per_sec_at_1_class"]),
                   REFERENCE_IMAGES_PER_SEC_MEASURED)
    except Exception:
        return REFERENCE_IMAGES_PER_SEC_MEASURED


def main() -> None:
    from __graft_entry__ import _flagship_model

    model = _flagship_model()
    # The default headline lane is the fastest configuration whose quality
    # is certified on the REAL TPU numerical path by tools/seg_parity.py
    # (BASELINE.md "mIoU parity" tables): ToMe r=16 token merging +
    # int8_static image-tower PTQ with calibrated activation scales —
    # measured 1.73-1.9% pixel disagreement / <=0.4 mIoU pt vs the exact
    # torch+CRF rederivation, within the same gates as the float lane.
    # The exact float pipeline stays one env var away:
    #   SIMSEG_BENCH_TOME=0 SIMSEG_BENCH_QUANT=none python bench.py
    tome_r = int(os.environ.get("SIMSEG_BENCH_TOME", "16") or 0)
    # per-block merge schedule (models/vit.py tome_schedule): fewer, larger
    # merges cut the composed lane's distinct (T, int8) shape classes from
    # 12 to ~4, bounding cold compile; e.g.
    # SIMSEG_BENCH_TOME_SCHED=48,0,0,48,0,0,48,0,0,48,0,0
    tome_sched = tuple(
        int(x) for x in
        (os.environ.get("SIMSEG_BENCH_TOME_SCHED", "") or "").split(",")
        if x.strip())
    # int8 PTQ lanes (ops/quant.py): int8x8->32 on the MXU; 'int8_static'
    # folds calibrated activation scales into the weights (no per-token
    # max), 'int8' is the dynamic mode (quality cost in BASELINE.md)
    quant = os.environ.get("SIMSEG_BENCH_QUANT", "int8_static") or ""
    arch = ()
    if tome_sched:
        arch += (("tome_schedule", tome_sched),)
    elif tome_r > 0:
        arch += (("tome_r", tome_r),)
    if quant and quant != "none":
        arch += (("quant", quant),)
    if arch:
        model = model.clone(image_arch=arch)
    num_classes = 21  # PASCAL VOC label bank

    rng = np.random.default_rng(0)
    # smoke-test knobs (CPU lane validation); the driver's defaults stand
    batch_size = int(os.environ.get("SIMSEG_BENCH_BATCH", "64") or 64)
    images = jnp.asarray(
        rng.normal(size=(batch_size, 288, 288, 3)).astype(np.float32)
    )
    raw_images = jnp.asarray(
        rng.integers(0, 255, (batch_size, 288, 288, 3)).astype(np.uint8)
    )
    params = model.init(
        jax.random.key(0),
        {
            "image": images[:1],
            "input_ids": jnp.zeros((1, 25), jnp.int32),
            "attention_mask": jnp.ones((1, 25), jnp.int32),
        },
    )
    text_bank = jnp.asarray(
        rng.normal(size=(num_classes, 512)).astype(np.float32)
    )
    text_bank = text_bank / jnp.linalg.norm(text_bank, axis=-1, keepdims=True)

    if quant and quant != "none":
        # cache the int8 weights (and, for int8_static, calibrate activation
        # scales on the bench distribution) so the timed loop never
        # re-quantizes the f32 params (ops/quant.py)
        from simseg_tpu.ops.quant import cache_quant_state

        params = cache_quant_state(model, params, [
            ((images[: min(8, batch_size)],),
             {"method": lambda m, im: m.forward_image_tokens(im)}),
        ])

    try:
        from simseg_tpu.ops.seg_decode import make_seg_decode_fn

        decode = make_seg_decode_fn(
            num_classes=num_classes, image_size=288, patch_size=16,
            top_cls_num=10, candidate_classes=5,
        )
        have_decode = True
    except Exception:
        decode = None
        have_decode = False

    @jax.jit
    def seg_forward(params, images, raw_images, text_bank, acc):
        # `acc` chains a data dependency across iterations so the timing
        # loop measures completed device execution, not dispatch: on
        # tunneled/remote platforms block_until_ready can return before the
        # work is done, so we serialize via the scalar and fetch it once.
        tokens = model.apply(
            params, images, method=lambda m, im: m.forward_image_tokens(im)
        )
        patches = tokens[:, 1:]
        pooled = model.apply(
            params, patches, method=lambda m, t: m.forward_image_project(t)
        )
        dense = model.apply(
            params, patches, method=lambda m, t: m.project_image_tokens(t)
        )
        dense = dense / jnp.maximum(
            jnp.linalg.norm(dense, axis=-1, keepdims=True), 1e-12
        )
        if decode is not None:
            pred, conf = decode(dense, pooled, text_bank, raw_images)
            checksum = jnp.sum(pred).astype(jnp.float32) + jnp.sum(conf)
        else:
            # fallback: similarity maps only (pre-decode-kernel pipeline)
            sims = jnp.einsum("bnd,cd->bnc", dense, text_bank)
            scores = jnp.einsum("bd,cd->bc", pooled, text_bank)
            checksum = jnp.sum(sims) + jnp.sum(scores)
        return acc + checksum

    # warmup / compile
    acc = jnp.zeros((), jnp.float32)
    float(seg_forward(params, images, raw_images, text_bank, acc))

    iters = int(os.environ.get("SIMSEG_BENCH_ITERS", "20") or 20)
    rates = []
    for _trial in range(int(os.environ.get("SIMSEG_BENCH_TRIALS", "5") or 5)):
        acc = jnp.zeros((), jnp.float32)
        t0 = time.perf_counter()
        for _ in range(iters):
            acc = seg_forward(params, images, raw_images, text_bank, acc)
        float(acc)  # single device->host sync
        dt = time.perf_counter() - t0
        rates.append(batch_size * iters / dt)
    images_per_sec = float(np.median(rates))
    metric = (
        "seg_inference_images_per_sec_vitb288"
        if have_decode
        else "seg_backbone_images_per_sec_vitb288"
    )
    if tome_sched:
        metric += "_tomesched" + "-".join(str(r) for r in tome_sched if r)
    elif tome_r > 0:
        metric += f"_tome{tome_r}"
    if quant and quant != "none":
        metric += f"_{quant}"
    baseline = reference_rate()
    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(images_per_sec, 2),
                "unit": "images/sec/chip",
                "vs_baseline": round(images_per_sec / baseline, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
