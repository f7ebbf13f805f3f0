"""Zero-shot semantic segmentation evaluation CLI.

Parity: reference ``tools/seg_evaluation.py:184-253`` — same flags
(``--cfg``, ``--ckpt_path``, dotted config overrides), same flow: config ->
model -> checkpoint (+pos-embed interpolation on grid mismatch) -> per
dataset: label bank, top_cls_num (30 for pascal_context else 10), evaluate.

Usage:
    python tools/seg_evaluation.py --cfg configs/clip/simseg.vit-b.yaml \
        --ckpt_path ckpts/simseg.vit-b.pth data.valid_name=[pascal_voc]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from simseg_tpu.config import cfg, update_cfg
from simseg_tpu.data.datasets import build_seg_valid_loader
from simseg_tpu.data.tokenizer import build_tokenizer
from simseg_tpu.models.clip import build_clip_model
from simseg_tpu.tasks.clip.config import task_cfg_init_fn, update_clip_config
from simseg_tpu.tasks.seg_eval import evaluate_benchmark, load_label_bank
from simseg_tpu.utils.logger import logger


def parse_args():
    parser = argparse.ArgumentParser(description="SimSeg-TPU zero-shot segmentation")
    parser.add_argument("--cfg", type=str, required=True)
    parser.add_argument("--ckpt_path", type=str, default="")
    parser.add_argument("--vocab_file", type=str, default="",
                        help="WordPiece vocab for offline tokenization")
    args, overrides = parser.parse_known_args()
    update_cfg(task_cfg_init_fn, args.cfg, overrides,
               preprocess_fn=update_clip_config)
    return args


def main():
    import jax
    import jax.numpy as jnp

    args = parse_args()
    model = build_clip_model(cfg)

    size = cfg.transforms.input_size
    dummy = {
        "image": jnp.zeros((1, size, size, 3), jnp.float32),
        "input_ids": jnp.zeros((1, cfg.model.max_length), jnp.int32),
        "attention_mask": jnp.ones((1, cfg.model.max_length), jnp.int32),
    }
    params = model.init(jax.random.key(0), dummy)

    if args.ckpt_path:
        from simseg_tpu.checkpoint import load_pretrained_params

        params = load_pretrained_params(args.ckpt_path, params, cfg)
        logger.emph(f"Loaded ckpt path: {args.ckpt_path}")
    else:
        logger.warning("No --ckpt_path: evaluating randomly initialized weights")

    tokenizer = build_tokenizer(cfg.model.text_encoder.tag,
                                vocab_file=args.vocab_file or None)

    # multi-chip hosts: shard the eval batch over the data mesh (the
    # reference fans out one DDP process per GPU; here one jit spans chips)
    from simseg_tpu.parallel import make_mesh

    mesh = make_mesh() if len(jax.devices()) > 1 else None

    for name in cfg.data.valid_name:
        loader = build_seg_valid_loader(cfg, name)
        categories = load_label_bank(name)
        top_cls_num = 30 if name == "pascal_context" else 10
        evaluate_benchmark(loader, model, params, cfg, tokenizer, categories,
                           top_cls_num, name, mesh=mesh)


if __name__ == "__main__":
    main()
