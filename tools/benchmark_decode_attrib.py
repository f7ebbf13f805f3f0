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
