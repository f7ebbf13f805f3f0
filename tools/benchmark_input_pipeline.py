"""Input-pipeline benchmark: loader-only images/sec, PIL vs native decode.

Synthesizes a CC-like JPEG shard (default 512 photos at ~500x375), then
iterates the real training DataLoader (thread-pool decode + prefetch,
data/datasets.py) under the published train transforms
([random_resize_crop, autoaug] by default) and reports images/sec for the
PIL path and the native C++ path (data/_native/decode.cc) across worker
counts.

Usage:
    python tools/benchmark_input_pipeline.py [--images 512] [--size 500,375]
        [--workers 2,4,8] [--transforms random_resize_crop,autoaug]

Prints one JSON line per configuration plus a summary line.
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


def make_shard(root: str, n: int, w: int, h: int, seed: int = 0) -> None:
    from PIL import Image

    rng = np.random.default_rng(seed)
    d = os.path.join(root, "bench", "train")
    os.makedirs(d, exist_ok=True)
    rows = ["image,caption"]
    for i in range(n):
        # low-frequency content so files have JPEG-realistic size
        small = rng.integers(0, 255, (h // 8, w // 8, 3), np.uint8)
        img = Image.fromarray(small).resize((w, h), Image.BILINEAR)
        name = f"{i:05d}.jpg"
        img.save(os.path.join(d, name), "JPEG", quality=90)
        rows.append(f"{name},a synthetic benchmark photo number {i}")
    with open(os.path.join(root, "bench", "train_anno.csv"), "w") as f:
        f.write("\n".join(rows))


def build_cfg(data_path: str, transforms: list, batch_size: int,
              workers: int, native: bool):
    from simseg_tpu.config import new_base_cfg
    from simseg_tpu.tasks.clip.config import task_cfg_init_fn

    cfg = new_base_cfg()
    task_cfg_init_fn(cfg)
    cfg.data.data_path = data_path
    cfg.data.train_name = ["bench"]
    cfg.data.batch_size = batch_size
    cfg.data.num_workers = workers
    cfg.data.native_decode = native
    cfg.data.enable_valid = False
    cfg.transforms.train_transforms = list(transforms)
    cfg.transforms.random_resize_crop.size = 224
    cfg.model.max_length = 25
    return cfg


def measure(cfg, vocab, epochs: int = 1) -> float:
    from simseg_tpu.data.datasets import CsvPairDataset, DataLoader
    from simseg_tpu.data.tokenizer import WordPieceTokenizer
    from simseg_tpu.data.transforms import build_transforms

    tok = WordPieceTokenizer(vocab)
    tf = build_transforms(cfg, "train")
    ds = CsvPairDataset(cfg, "bench", tok, tf, "train")
    loader = DataLoader(ds, cfg.data.batch_size, shuffle=True, drop_last=True,
                        num_workers=cfg.data.num_workers)
    # warm one batch (thread pool spin-up, native lib dlopen)
    next(iter(loader))
    n = 0
    t0 = time.perf_counter()
    for _ in range(epochs):
        for batch in loader:
            n += batch["image"].shape[0]
    return n / (time.perf_counter() - t0)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=512)
    ap.add_argument("--size", type=str, default="500,375")
    ap.add_argument("--batch_size", type=int, default=64)
    ap.add_argument("--workers", type=str, default="")
    ap.add_argument("--transforms", type=str,
                    default="random_resize_crop,autoaug")
    args = ap.parse_args()
    w, h = (int(x) for x in args.size.split(","))
    workers = [int(x) for x in args.workers.split(",") if x] or [
        max(1, (os.cpu_count() or 2) // 2), os.cpu_count() or 2
    ]
    transforms = [t for t in args.transforms.split(",") if t]

    from simseg_tpu.data import native
    from simseg_tpu.data.tokenizer import make_test_vocab

    vocab = make_test_vocab(
        "a synthetic benchmark photo number".split() + ["[unused]"]
    )

    with tempfile.TemporaryDirectory() as root:
        make_shard(root, args.images, w, h)
        results = {}
        for nw in workers:
            for use_native in ([False, True] if native.available()
                               else [False]):
                cfg = build_cfg(root + "/", transforms, args.batch_size, nw,
                                use_native)
                rate = measure(cfg, vocab)
                key = f"{'native' if use_native else 'pil'}_w{nw}"
                results[key] = round(rate, 1)
                print(json.dumps({
                    "decode": "native" if use_native else "pil",
                    "workers": nw, "img_per_sec": round(rate, 1),
                    "transforms": transforms,
                    "src_size": f"{w}x{h}",
                }))
        print(json.dumps({"summary": results}))


if __name__ == "__main__":
    main()
