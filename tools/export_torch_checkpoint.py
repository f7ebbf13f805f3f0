"""Export a trained model as a reference-layout torch ``.pth`` checkpoint.

The reverse of the loading bridge: a checkpoint trained with THIS framework
(native msgpack/orbax — or a .pth being round-tripped) is written in the
PyTorch reference's published state-dict layout, so the original SimSeg
codebase, its eval tools (tools/seg_evaluation.py, retrieval_evaluation.py)
and anything torch-side built around them can consume models trained here
with ``strict=True``. See simseg_tpu/checkpoint/torch_export.py.

Usage:
    python tools/export_torch_checkpoint.py --cfg configs/clip/simseg.vit-b.yaml \
        --ckpt_path output/run/ckpt --out simseg_vitb_from_tpu.pth
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", required=True)
    ap.add_argument("--ckpt_path", required=True,
                    help="native checkpoint dir / ckpt.dir parent / orbax "
                         "dir, or a torch .pth to round-trip")
    ap.add_argument("--out", required=True)
    ap.add_argument("--non_strict", action="store_true",
                    help="tolerate (with a warning) a partial .pth source "
                         "checkpoint and leaves the reference layout has no "
                         "slot for, instead of raising")
    ap.add_argument("overrides", nargs="*")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from simseg_tpu.checkpoint import load_pretrained_params
    from simseg_tpu.checkpoint.torch_export import save_clip_checkpoint
    from simseg_tpu.config import new_base_cfg, update_cfg
    from simseg_tpu.models.clip import build_clip_model
    from simseg_tpu.tasks.clip.config import task_cfg_init_fn, update_clip_config

    cfg = update_cfg(task_cfg_init_fn, args.cfg, args.overrides,
                     preprocess_fn=update_clip_config, target=new_base_cfg())
    model = build_clip_model(cfg)
    size = cfg.transforms.input_size
    dummy = {
        "image": jnp.zeros((1, size, size, 3), jnp.float32),
        "input_ids": jnp.zeros((1, cfg.model.max_length), jnp.int32),
        "attention_mask": jnp.ones((1, cfg.model.max_length), jnp.int32),
    }
    variables = model.init(jax.random.key(0), dummy)
    # strict by default: a missing/mismatched source key would otherwise keep
    # the model.init() random weights and export them as if trained
    variables = load_pretrained_params(args.ckpt_path, variables, cfg,
                                       strict=not args.non_strict)

    report = save_clip_checkpoint(
        args.out, variables,
        projection=cfg.model.projection.name,
        meta={"source": args.ckpt_path, "cfg": args.cfg,
              "exporter": "simseg_tpu"},
        strict=not args.non_strict,
    )
    print(f"wrote {args.out}: {len(report['exported'])} tensors"
          + (f", {len(report['skipped'])} skipped" if report["skipped"] else ""))


if __name__ == "__main__":
    main()
