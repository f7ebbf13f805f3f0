"""Component-level performance harness (single chip).

Prints one line per component. Timing methodology: a scalar accumulator is
chained through the iterations and fetched once per trial, so the numbers
measure completed device execution even on tunneled platforms where
``block_until_ready`` can return early (see CLAUDE.md).

Usage: python tools/benchmark_components.py [--batch 16] [--iters 20]
       [--only train]   # run only lanes whose name contains the substring
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bench_common import timed_rate as timed  # noqa: E402
from bench_common import tower_flops  # noqa: E402


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=16)
    parser.add_argument("--iters", type=int, default=20)
    parser.add_argument("--only", default="",
                        help="run only lanes whose name contains this "
                             "substring (tunneled sessions: each skipped "
                             "lane saves a 20-90 s compile)")
    args = parser.parse_args()
    b = args.batch

    def want(name: str) -> bool:
        return args.only in name if args.only else True

    from simseg_tpu.models.clip import CLIPModel
    from simseg_tpu.ops.seg_decode import make_seg_decode_fn
    from simseg_tpu.ops.pooling import l2_normalize

    model = CLIPModel(
        image_tag="vit_base_patch16_224_in21k", img_size=288,
        text_tag="bert-base-uncased", projection_name="simple",
        projection_dim=512, pool_name="loda", image_k=5, text_k=1,
        temperature_name="parameter", temperature_init=0.02,
        dtype=jnp.bfloat16,
    )
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.normal(size=(b, 288, 288, 3)).astype(np.float32))
    raw = jnp.asarray(rng.integers(0, 255, (b, 288, 288, 3)).astype(np.uint8))
    ids = jnp.asarray(rng.integers(0, 30522, (b, 25)).astype(np.int32))
    mask = jnp.ones((b, 25), jnp.int32)
    batch = {"image": images[:1], "input_ids": ids[:1], "attention_mask": mask[:1]}
    params = model.init(jax.random.key(0), batch)
    tb = rng.normal(size=(21, 512)).astype(np.float32)
    tb = jnp.asarray(tb / np.linalg.norm(tb, axis=1, keepdims=True))

    results = {}

    if want("image_tower_fwd"):
        @jax.jit
        def image_fwd(params, x, acc):
            t = model.apply(params, x, method=lambda m, im: m.forward_image_tokens(im))
            return acc + jnp.sum(t).astype(jnp.float32)

        results["image_tower_fwd"] = timed(image_fwd, (params, images), b, args.iters)

    if want("text_tower_fwd"):
        @jax.jit
        def text_fwd(params, i, m, acc):
            h = model.apply(params, i, m,
                            method=lambda mm, a, c: mm.forward_text_feature(a, c))
            return acc + jnp.sum(h).astype(jnp.float32)

        results["text_tower_fwd"] = timed(text_fwd, (params, ids, mask), b, args.iters)

    for backend in ("pallas", "xla"):
        if not want(f"seg_decode_{backend}"):
            continue
        decode = make_seg_decode_fn(21, 288, 16, 10, 5, crf_backend=backend)
        dense = l2_normalize(jnp.asarray(
            rng.normal(size=(b, 324, 512)).astype(np.float32)))
        pooled = l2_normalize(jnp.asarray(
            rng.normal(size=(b, 512)).astype(np.float32)))

        @jax.jit
        def decode_fn(d, p, t, r, acc):
            pred, bw = decode(d, p, t, r)
            return acc + jnp.sum(pred).astype(jnp.float32) + jnp.sum(bw)

        results[f"seg_decode_{backend}"] = timed(
            decode_fn, (dense, pooled, tb, raw), b, args.iters)

    if want("seg_end_to_end"):
        @jax.jit
        def end_to_end(params, x, r, t, acc):
            tokens = model.apply(params, x, method=lambda m, im: m.forward_image_tokens(im))
            patches = tokens[:, 1:]
            pooled = model.apply(params, patches,
                                 method=lambda m, tt: m.forward_image_project(tt))
            dense = model.apply(params, patches,
                                method=lambda m, tt: m.project_image_tokens(tt))
            dense = l2_normalize(dense.astype(jnp.float32))
            decode = make_seg_decode_fn(21, 288, 16, 10, 5)
            pred, bw = decode(dense, pooled.astype(jnp.float32), t, r)
            return acc + jnp.sum(pred).astype(jnp.float32) + jnp.sum(bw)

        results["seg_end_to_end"] = timed(end_to_end, (params, images, raw, tb),
                                          b, args.iters)

    # MoE image tower (beyond reference, ops/moe.py): 8 experts in every 2nd
    # block — measures the dense-dispatch routing overhead vs the dense MLP
    if want("image_tower_fwd_moe8"):
        moe_model = model.clone(image_arch=(("moe_experts", 8),))
        moe_params = moe_model.init(jax.random.key(1), batch)

        @jax.jit
        def moe_image_fwd(p, x, acc):
            t = moe_model.apply(p, x,
                                method=lambda m, im: m.forward_image_tokens(im))
            return acc + jnp.sum(t).astype(jnp.float32)

        results["image_tower_fwd_moe8"] = timed(
            moe_image_fwd, (moe_params, images), b, args.iters)

    # token-merging tower (beyond reference, ops/tome.py): r=16 shrinks
    # 325 -> 133 tokens over the 12 blocks (~30% fewer block FLOPs); same
    # params, unmerged full-sequence output. Measures the net win after
    # the per-block matching/merge overhead.
    for tome_r in (8, 16):
        if not want(f"image_tower_fwd_tome{tome_r}"):
            continue
        tome_model = model.clone(image_arch=(("tome_r", tome_r),))

        @jax.jit
        def tome_image_fwd(p, x, acc):
            t = tome_model.apply(
                p, x, method=lambda m, im: m.forward_image_tokens(im))
            return acc + jnp.sum(t).astype(jnp.float32)

        results[f"image_tower_fwd_tome{tome_r}"] = timed(
            tome_image_fwd, (params, images), b, args.iters)

    # int8 PTQ tower (beyond reference, ops/quant.py): every block matmul
    # int8x8->int32 on the MXU (2x bf16 peak on v5e) with dynamic
    # per-token activation scales — measures the net win after the
    # quantize/dequantize overhead. Same params (forward transform).
    if want("image_tower_fwd_int8"):
        int8_model = model.clone(image_arch=(("quant", "int8"),))

        @jax.jit
        def int8_image_fwd(p, x, acc):
            t = int8_model.apply(
                p, x, method=lambda m, im: m.forward_image_tokens(im))
            return acc + jnp.sum(t).astype(jnp.float32)

        results["image_tower_fwd_int8"] = timed(
            int8_image_fwd, (params, images), b, args.iters)

    # full contrastive train step (fwd + bwd + AdamW), flagship model
    if want("clip_train_step") or want("clip_train_step_tome16"):
        from simseg_tpu.core.optim import build_optimizer
        from simseg_tpu.engine import TrainState, make_train_step
        from simseg_tpu.utils.collections import AttrDict, OpenDict

        cfg = AttrDict()
        cfg.optim = AttrDict()
        cfg.optim.name = "torch.optim.AdamW"
        cfg.optim.param = OpenDict(betas=(0.9, 0.98), eps=1e-6, weight_decay=0.001)
        cfg.optim.param_group_rules = OpenDict()
        cfg.optim.grad_clip = OpenDict()
        tx, set_lr = build_optimizer(cfg, params)
        train_batch = {"image": images, "input_ids": ids, "attention_mask": mask}

        def timed_train(step_fn, state):
            def run(s):
                t0 = time.perf_counter()
                iters = max(args.iters // 2, 5)
                for i in range(iters):
                    s, metrics = step_fn(s, train_batch, jax.random.key(i), 1e-4)
                float(metrics["loss"])  # sync
                return b * iters / (time.perf_counter() - t0), s

            _, state = run(state)  # compile + warm
            rates = []
            for _ in range(3):
                r, state = run(state)
                rates.append(r)
            return float(np.median(rates))

    if want("clip_train_step"):
        results["clip_train_step"] = timed_train(
            make_train_step(model, tx, set_lr, donate=False),
            TrainState.create(params, tx))

    # train step with the token-merging tower (same param tree, so the
    # optimizer state shape is unchanged): measures how much of the tome
    # forward win survives the bwd pass + optimizer
    if want("clip_train_step_tome16"):
        tome16 = model.clone(image_arch=(("tome_r", 16),))
        results["clip_train_step_tome16"] = timed_train(
            make_train_step(tome16, tx, set_lr, donate=False),
            TrainState.create(params, tx))

    # MFU: analytic dense FLOPs per sample for the flagship towers
    # (bench_common.tower_flops; train step ~= 3x forward).
    vit = tower_flops(325, 768, 12, extra=325 * 768 * (3 * 256) + 325 * 768 * 512)
    bert = tower_flops(25, 768, 12, extra=25 * 768 * 512)
    fwd_flops = vit + bert
    train_flops = 3.0 * fwd_flops
    peak = 197e12 if jax.default_backend() != "cpu" else float("nan")  # v5e bf16

    print(f"\n== component throughput (batch {b}, images/sec/chip) ==")
    for k, v in results.items():
        print(f"{k:24s} {v:10.1f}")
    if "clip_train_step" in results and "image_tower_fwd" in results:
        mfu = results["clip_train_step"] * train_flops / peak
        fwd_mfu = results["image_tower_fwd"] * vit / peak
        print(f"\ntrain_flops/sample ~ {train_flops / 1e9:.1f} GFLOP; "
              f"train-step MFU ~ {100 * mfu:.1f}% of v5e bf16 peak "
              f"(image-tower fwd MFU ~ {100 * fwd_mfu:.1f}%)")


if __name__ == "__main__":
    main()
