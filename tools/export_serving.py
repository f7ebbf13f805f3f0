"""Export a self-contained serving artifact (StableHLO via jax.export).

Bakes the model weights (from a torch .pth via the bridge, or a native
msgpack checkpoint) and the prompt-ensembled class-text bank into one
deserializable inference graph. See simseg_tpu/serving.py.

Usage:
    python tools/export_serving.py --cfg configs/clip/simseg.vit-b.yaml \
        --ckpt_path ckpts/simseg.vit-b.pth --kind seg \
        --dataset pascal_voc --batch 64 --out simseg_vitb_voc_b64.shlo

    --kind seg        full zero-shot segmentation pipeline
    --kind retrieval  two-tower embedding forward
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", required=True)
    ap.add_argument("--ckpt_path", default="")
    ap.add_argument("--kind", choices=("seg", "retrieval"), default="seg")
    ap.add_argument("--dataset", default="pascal_voc")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--out", required=True)
    ap.add_argument("--vocab_file", default="")
    ap.add_argument("--platforms", default="",
                    help="comma-separated lowering targets, e.g. 'tpu'")
    ap.add_argument("--calib_images", type=int, default=32,
                    help="int8_static: number of calibration images when "
                         "--calib_npy is not given (random data; use real "
                         "images for production)")
    ap.add_argument("--calib_npy", default="",
                    help="int8_static: .npy of (N, size, size, 3) f32 "
                         "images for activation-scale calibration")
    ap.add_argument("--weights", choices=("baked", "separate"),
                    default="baked",
                    help="'baked': weights are constants in one artifact; "
                         "'separate': weights as graph arguments, written "
                         "to <out>.weights (small compile payload, weight "
                         "rotation without re-export)")
    ap.add_argument("overrides", nargs="*")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from simseg_tpu import serving
    from simseg_tpu.config import new_base_cfg, update_cfg
    from simseg_tpu.models.clip import build_clip_model
    from simseg_tpu.tasks.clip.config import task_cfg_init_fn, update_clip_config
    from simseg_tpu.tasks.seg_eval import load_label_bank

    cfg = update_cfg(task_cfg_init_fn, args.cfg, args.overrides,
                     preprocess_fn=update_clip_config, target=new_base_cfg())
    model = build_clip_model(cfg)
    size = cfg.transforms.input_size
    dummy = {
        "image": jnp.zeros((1, size, size, 3), jnp.float32),
        "input_ids": jnp.zeros((1, cfg.model.max_length), jnp.int32),
        "attention_mask": jnp.ones((1, cfg.model.max_length), jnp.int32),
    }
    params = model.init(jax.random.key(0), dummy)
    if args.ckpt_path:
        # torch .pth via the bridge, or a native checkpoint dir / ckpt.dir
        # (what this framework's training writes) by extension
        from simseg_tpu.checkpoint import load_pretrained_params

        params = load_pretrained_params(args.ckpt_path, params, cfg)
    else:
        print("WARNING: no --ckpt_path, exporting randomly initialized weights")

    # int8_static towers need the calibrated 'quant' collection (cached
    # int8 weights + static activation scales) BEFORE staging — the
    # artifact bakes it, so served int8 numerics == evaluated numerics
    # (ops/quant.py cache_quant_state; uncalibrated exports refuse loudly)
    def _quant_of(enc):
        return dict(enc.get("arch", {}) or {}).get("quant", "none") or "none"

    quants = {_quant_of(cfg.model.image_encoder),
              _quant_of(cfg.model.text_encoder)}
    if quants - {"none"}:
        from simseg_tpu.ops.quant import cache_quant_state

        rng = np.random.default_rng(0)
        if args.calib_npy:
            imgs = np.load(args.calib_npy).astype(np.float32)
        else:
            print("WARNING: calibrating int8 activation scales on random "
                  "data; pass --calib_npy with representative images for "
                  "production exports")
            imgs = rng.normal(size=(args.calib_images, size, size, 3)
                              ).astype(np.float32)
        calls = []
        for i in range(0, len(imgs), 8):
            calls.append(((jnp.asarray(imgs[i:i + 8]),),
                          {"method": lambda m, im: m.forward_image_tokens(im)}))
        if _quant_of(cfg.model.text_encoder) != "none":
            ids = jnp.asarray(rng.integers(
                0, 100, (8, cfg.model.max_length)).astype(np.int32))
            mask = jnp.ones_like(ids)
            calls.append(((), {"method":
                               lambda m, i=ids, a=mask: m.forward_text_feature(i, a)}))
        params = cache_quant_state(model, params, calls)
        print(f"calibrated int8 quant state on {len(imgs)} images")
    platforms = [p for p in args.platforms.split(",") if p] or None

    if args.kind == "seg":
        from simseg_tpu.data.tokenizer import build_tokenizer
        from simseg_tpu.tasks.seg_eval import (image_patch_stride,
                                               zero_shot_classifier)

        tokenizer = build_tokenizer(cfg.model.text_encoder.tag,
                                    vocab_file=args.vocab_file or None)
        classes = load_label_bank(args.dataset)
        bank = jnp.asarray(zero_shot_classifier(
            model, params, classes, tokenizer, cfg.model.max_length))
        top_cls = 30 if args.dataset == "pascal_context" else 10
        baked = args.weights == "baked"
        fn = serving.make_seg_infer_fn(
            model, params, bank, cfg, num_classes=len(classes),
            top_cls_num=top_cls, patch_size=image_patch_stride(model),
            bake_weights=baked,
        )
        # raw uint8 only: normalization constants are baked into the export
        example = (np.zeros((args.batch, size, size, 3), np.uint8),)
    else:
        baked = args.weights == "baked"
        fn = serving.make_embed_fn(model, params, cfg, bake_weights=baked)
        example = (
            np.zeros((args.batch, size, size, 3), np.uint8),
            np.zeros((args.batch, cfg.model.max_length), np.int32),
            np.ones((args.batch, cfg.model.max_length), np.int32),
        )

    if baked:
        data = serving.export_artifact(fn, example, platforms=platforms)
        serving.save_artifact(args.out, data)
        size_mb = len(data) / 1e6
    else:
        serving.export_artifact_separate(fn, params, example, args.out,
                                         platforms=platforms)
        size_mb = os.path.getsize(args.out) / 1e6
        print(f"wrote {args.out}.weights "
              f"({os.path.getsize(args.out + '.weights') / 1e6:.1f} MB)")
    print(f"wrote {args.out} ({size_mb:.1f} MB, kind={args.kind}, "
          f"weights={args.weights}, batch={args.batch}, input={size}px)")


if __name__ == "__main__":
    main()
