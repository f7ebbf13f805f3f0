"""Decode-stage attribution benchmark (single chip).

The zero-shot seg decode (ops/seg_decode.py — the on-device replacement for
the reference's host loop ``tools/seg_evaluation.py:131-163``) is the
end-to-end bottleneck once the tower rides ToMe/int8. This harness breaks
its cost into stages by timing ablated variants and differencing, so the
optimization work targets the measured hot spot instead of a guess:

- full decode at several bilateral strides (the kernel size knob)
- crf_iters=0 (kernel/degree build + init only) vs 1 vs 3
- morphology_ksize=1 (closing ablated)
- the CRF alone on synthetic probability maps, both bilateral impls
- the 7x7 closing alone

Timing methodology: chained scalar accumulator (see tools/bench_common.py).

Usage: python tools/benchmark_decode_attrib.py [--batch 64] [--iters 10]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bench_common import timed_secs  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--trials", type=int, default=3)
    args = ap.parse_args()
    b = args.batch

    from simseg_tpu.ops.crf import dense_crf_batched
    from simseg_tpu.ops.morphology import closing
    from simseg_tpu.ops.pooling import l2_normalize
    from simseg_tpu.ops.seg_decode import make_seg_decode_fn

    rng = np.random.default_rng(0)
    dense = l2_normalize(
        jnp.asarray(rng.normal(size=(b, 324, 512)).astype(np.float32)))
    pooled = l2_normalize(
        jnp.asarray(rng.normal(size=(b, 512)).astype(np.float32)))
    tb = rng.normal(size=(21, 512)).astype(np.float32)
    tb = jnp.asarray(tb / np.linalg.norm(tb, axis=1, keepdims=True))
    raw = jnp.asarray(rng.integers(0, 255, (b, 288, 288, 3)).astype(np.uint8))
    probs = jnp.asarray(
        rng.uniform(0.0, 1.0, (b, 5, 288, 288)).astype(np.float32))

    rows = []

    def add(name, secs):
        rows.append((name, secs * 1e3, b / secs))
        print(f"{name:34s} {secs * 1e3:8.2f} ms/call {b / secs:9.1f} img/s",
              flush=True)

    def time_decode(name, **kw):
        decode = make_seg_decode_fn(21, 288, 16, 10, 5, **kw)

        def fn(d, p, t, r, acc):
            pred, bw = decode(d, p, t, r)
            return acc + jnp.sum(pred).astype(jnp.float32) + jnp.sum(bw)

        add(name, timed_secs(jax.jit(fn), (dense, pooled, tb, raw),
                             iters=args.iters, trials=args.trials))

    # stride sweep (kernel matrix is O((HW/s^2)^2))
    for s in (4, 8, 12, 16):
        time_decode(f"decode_stride{s}", bilateral_stride=s)

    # stage ablations at the default stride
    time_decode("decode_iters0(build+init)", crf_iters=0)
    time_decode("decode_iters1", crf_iters=1)
    time_decode("decode_no_morph", morphology_ksize=1)
    time_decode("decode_no_crf_no_morph", crf_iters=0, morphology_ksize=1)
    time_decode("decode_closing_matmul", morphology_impl="matmul")

    # CRF alone, both bilateral impls
    for impl in ("xla", "pallas"):
        def crf_fn(p, r, acc, impl=impl):
            m = dense_crf_batched(p, r, bilateral_stride=8,
                                  bilateral_impl=impl)
            return acc + jnp.sum(m).astype(jnp.float32)

        add(f"crf_only_{impl}", timed_secs(
            jax.jit(crf_fn), (probs, raw), iters=args.iters,
            trials=args.trials))

    # closing alone (bf16, the dtype the decode uses on TPU)
    masks = (probs > 0.5).astype(jnp.bfloat16)

    def close_fn(m, acc):
        return acc + jnp.sum(closing(m, 7)).astype(jnp.float32)

    add("closing7_only", timed_secs(jax.jit(close_fn), (masks,),
                                    iters=args.iters, trials=args.trials))

    from simseg_tpu.ops.morphology import binary_closing_matmul

    def close_mm_fn(m, acc):
        return acc + jnp.sum(binary_closing_matmul(m, 7)).astype(jnp.float32)

    add("closing7_matmul_only", timed_secs(jax.jit(close_mm_fn), (masks,),
                                           iters=args.iters,
                                           trials=args.trials))

    # ---- mean-field micro-attribution (the 3-iteration loop dominates the
    # decode; these lanes time its per-iteration components in isolation, in
    # the exact dtype/shapes the TPU lane runs: bf16 fine grid, B*K=5B maps,
    # stride-8 coarse bilateral) ----
    from simseg_tpu.ops.crf import (
        _bilateral_kernel_matrix,
        _box_downsample,
        _gaussian_taps,
        _sep_blur,
    )
    from simseg_tpu.ops.morphology import nearest_upsample

    taps = jnp.asarray(_gaussian_taps(3.0)).astype(jnp.bfloat16)
    d_fine = (probs * 2.0 - 1.0).astype(jnp.bfloat16)        # (B, 5, 288, 288)
    rgb_small = jnp.moveaxis(_box_downsample(
        jnp.moveaxis(raw.astype(jnp.float32), -1, 1), 8), 1, -1)
    kmat0 = jax.jit(jax.vmap(
        lambda r: _bilateral_kernel_matrix(r, 40.0, 13.0, 8)))(rgb_small)
    kmat_bf16 = kmat0.astype(jnp.bfloat16)

    def lane(name, f, arrs):
        add(name, timed_secs(jax.jit(f), arrs, iters=args.iters,
                             trials=args.trials))

    def gauss_x3(d, acc):
        for _ in range(3):
            d = _sep_blur(d, taps)
        return acc + jnp.sum(d).astype(jnp.float32)

    lane("mf_gauss_blur_x3", gauss_x3, (d_fine,))

    def blur_w_x3(d, acc):
        from simseg_tpu.ops.crf import _band_matrix
        band_w = _band_matrix(288, taps)
        n = d.reshape(-1, 288, 288)
        for _ in range(3):
            n = jnp.einsum("nhw,wv->nhv", n, band_w,
                           preferred_element_type=jnp.float32
                           ).astype(d.dtype)
        return acc + jnp.sum(n).astype(jnp.float32)

    lane("mf_blur_w_only_x3", blur_w_x3, (d_fine,))

    def blur_h_x3(d, acc):
        from simseg_tpu.ops.crf import _band_matrix
        band_h = _band_matrix(288, taps)
        n = d.reshape(-1, 288, 288)
        for _ in range(3):
            n = jnp.einsum("nhv,hu->nuv", n, band_h,
                           preferred_element_type=jnp.float32
                           ).astype(d.dtype)
        return acc + jnp.sum(n).astype(jnp.float32)

    lane("mf_blur_h_only_x3", blur_h_x3, (d_fine,))

    def bilateral_x3(d, km, acc):
        bsz = d.shape[0]
        for _ in range(3):
            small = _box_downsample(d, 8).reshape(bsz, 5, -1)
            m = jnp.einsum("bcn,bmn->bcm", small, km,
                           preferred_element_type=jnp.float32
                           ).astype(d.dtype)
            d = nearest_upsample(m.reshape(bsz, 5, 36, 36), 8)
        return acc + jnp.sum(d).astype(jnp.float32)

    lane("mf_bilateral_apply_x3", bilateral_x3, (d_fine, kmat_bf16))

    def kmat_build(r, acc):
        km = jax.vmap(
            lambda x: _bilateral_kernel_matrix(x, 40.0, 13.0, 8))(r)
        return acc + jnp.sum(km).astype(jnp.float32)

    lane("mf_kmat_build", kmat_build, (rgb_small,))

    def tanh_x3(d, acc):
        for _ in range(3):
            d = jnp.tanh((d + d) * 0.5)
        return acc + jnp.sum(d).astype(jnp.float32)

    lane("mf_tanh_combine_x3", tanh_x3, (d_fine,))

    print("\n== derived attribution (stride 8, ms/call) ==")
    t = {n: ms for n, ms, _ in rows}
    if "decode_stride8" in t and "decode_iters0(build+init)" in t:
        full = t["decode_stride8"]
        print(f"mean-field 3 iters      {full - t['decode_iters0(build+init)']:8.2f}")
        print(f"kernel build + rest     {t['decode_iters0(build+init)']:8.2f}")
        if "decode_no_morph" in t:
            print(f"closing (in-situ)       {full - t['decode_no_morph']:8.2f}")


if __name__ == "__main__":
    main()
