"""Real-loader vs synthetic-batch train throughput (single chip).

Answers round-2 VERDICT weak #2/next #4 quantitatively: with the train
loop's device staging (``data.device_prefetch``), how close does training
fed by the REAL input pipeline (disk JPEGs -> thread-pool decode ->
transforms -> staged H2D + on-device normalize) come to the same step
function fed a pre-staged synthetic device batch?

Method: flagship towers (ViT-B/16 @288 + BERT-base, bf16), batch 32. A
synthetic JPEG shard is written to disk; one CLIPRunner is built per
configuration and ``runner.train()`` is timed on its second epoch (the
first epoch pays the jit compile). The synthetic bound loops the runner's
own ``_step_fn`` on one pre-staged batch. Reported: img/s for synthetic,
real+prefetch=0 (staging off, prepare on the critical path), and
real+prefetch=2 (default), plus the loader-only rate for context.

Usage:
    python tools/benchmark_train_pipeline.py [--batch 32] [--steps 30]
        [--images 512] [--workers 8] [--size 500,375]

Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_runner(root, vocab_file, batch, steps, workers, prefetch):
    import jax

    from simseg_tpu.config import new_base_cfg, update_cfg
    from simseg_tpu.core.runner import CLIPRunner
    from simseg_tpu.data.datasets import build_clip_dataloaders
    from simseg_tpu.data.tokenizer import build_tokenizer
    from simseg_tpu.models.clip import build_clip_model
    from simseg_tpu.tasks.clip.config import task_cfg_init_fn

    cfg = update_cfg(task_cfg_init_fn, None, argv=[
        "epoch=2",
        "seed=0",
        "dist.bf16=true",
        "log.interval_train=1000000",
        "ckpt.step_interval=-1",
        f"ckpt.dir={root}/ckpt",
        "data.exp_name=pipe_bench",
        "data.train_type=shuffle",
        "data.train_name=[bench]",
        "data.enable_valid=false",
        f"data.batch_size={batch}",
        f"data.num_workers={workers}",
        f"data.train_steps={steps}",
        f"data.device_prefetch={prefetch}",
        "data.native_decode=true",
        f"data.data_path={root}/",
        "model.image_encoder.tag=vit_base_patch16_224_in21k",
        "model.text_encoder.tag=bert-base-uncased",
        "model.projection.name=simple",
        "model.projection.dim=512",
        "model.pool.name=loda",
        "model.pool.loda.image_k=5",
        "model.pool.loda.text_k=1",
        "model.max_length=25",
        "loss.temperature.name=parameter",
        "loss.temperature.value=0.02",
        "optim.lr.name=constant_schedule",
        "optim.lr.init=1.0e-4",
        "transforms.input_size=288",
        "transforms.resize.size=288",
        # random_resize_crop reads ITS OWN size key, not input_size — without
        # this the loader yields 224px batches and the step silently runs at
        # 0.64x the flagship FLOPs (how an early 685 img/s reading happened)
        "transforms.random_resize_crop.size=288",
        "transforms.train_transforms=[random_resize_crop]",
        "transforms.valid_transforms=[resize]",
    ], target=new_base_cfg())

    tokenizer = build_tokenizer(cfg.model.text_encoder.tag,
                                vocab_file=vocab_file)
    model = build_clip_model(cfg)
    loaders = build_clip_dataloaders(cfg, tokenizer=tokenizer)
    runner = CLIPRunner(cfg, model, loaders, mesh=None)
    return runner


def timed_epoch(runner) -> float:
    """Seconds for one full train 'epoch' (train_steps steps), synced."""
    import jax

    t0 = time.perf_counter()
    runner.train()
    jax.block_until_ready(runner.train_state.params)
    # tunneled platforms: force one scalar fetch so the clock covers real
    # device completion (CLAUDE.md)
    float(jax.tree.leaves(runner.train_state.params)[0].ravel()[0])
    return time.perf_counter() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--images", type=int, default=512)
    ap.add_argument("--workers", type=int, default=8)
    ap.add_argument("--size", type=str, default="500,375")
    args = ap.parse_args()
    w, h = (int(x) for x in args.size.split(","))

    from tools.benchmark_input_pipeline import make_shard

    root = tempfile.mkdtemp(prefix="train_pipe_")
    try:
        # the timed epoch must actually run `steps` steps: a shard shorter
        # than batch*steps would end the epoch early while the img/s math
        # still divides by `steps`
        make_shard(root, max(args.images, args.batch * args.steps), w, h)
        from simseg_tpu.data.tokenizer import make_test_vocab

        vocab = os.path.join(root, "vocab.txt")
        with open(vocab, "w") as f:
            for t in make_test_vocab(
                    ["a", "synthetic", "benchmark", "photo", "number"]
                    + [str(i) for i in range(10)]):
                f.write(t + "\n")

        import jax

        results = {}
        for prefetch in (2, 0):
            runner = build_runner(root, vocab, args.batch, args.steps,
                                  args.workers, prefetch)
            # benchmark loop only: no epoch checkpoints / signal handlers
            runner._hooks = [h for h in runner._hooks
                             if type(h).__name__ not in
                             ("CheckpointHook", "PreemptionHook")]
            timed_epoch(runner)  # epoch 1: compile + warm
            runner.epoch = 1
            secs = timed_epoch(runner)
            results[f"real_prefetch{prefetch}"] = args.batch * args.steps / secs
            if prefetch == 2:
                # synthetic bound from the SAME runner/step fn: one
                # pre-staged device batch looped train_steps times
                batch0 = next(iter(runner.train_loaders[0]))
                device_batch = runner._prepare_batch(batch0)
                state = runner.train_state
                t0 = time.perf_counter()
                for i in range(args.steps):
                    state, metrics = runner._step_fn(
                        state, device_batch, None, 1e-4)
                float(metrics["loss"])
                results["synthetic"] = args.batch * args.steps / (
                    time.perf_counter() - t0)

        ratio = results["real_prefetch2"] / results["synthetic"]
        print(json.dumps({
            "batch": args.batch,
            "steps": args.steps,
            "img_per_s": {k: round(v, 1) for k, v in results.items()},
            "real_over_synthetic": round(ratio, 4),
        }))
    finally:
        import shutil

        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
