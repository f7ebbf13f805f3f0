"""Zero-shot image-text retrieval evaluation CLI.

Parity: reference ``tools/retrieval_evaluation.py:102-157`` — same flags and
flow: config -> model -> checkpoint -> per parquet val set: batched
embedding extraction -> R@1/5/10 + RSUM summary.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from simseg_tpu.config import cfg, update_cfg
from simseg_tpu.data.datasets import DataLoader, ParquetRetrievalDataset
from simseg_tpu.data.tokenizer import build_tokenizer
from simseg_tpu.data.transforms import build_transforms, normalize_images
from simseg_tpu.models.clip import build_clip_model
from simseg_tpu.tasks.clip.config import task_cfg_init_fn, update_clip_config
from simseg_tpu.utils.logger import logger
from simseg_tpu.utils.retrieval import retrieval_summary


def parse_args():
    parser = argparse.ArgumentParser(description="SimSeg-TPU retrieval eval")
    parser.add_argument("--cfg", type=str, required=True)
    parser.add_argument("--ckpt_path", type=str, default="")
    parser.add_argument("--vocab_file", type=str, default="")
    args, overrides = parser.parse_known_args()
    update_cfg(task_cfg_init_fn, args.cfg, overrides,
               preprocess_fn=update_clip_config)
    return args


def evaluate_benchmark(loader, model, params, cfg) -> dict:
    """parity: reference :65-99 — collect embeddings, summarize."""
    import jax
    import jax.numpy as jnp

    mean = tuple(cfg.transforms.normalize.mean)
    std = tuple(cfg.transforms.normalize.std)

    @jax.jit
    def embed(params, images_u8, input_ids, attention_mask):
        batch = {
            "image": normalize_images(images_u8, mean, std),
            "input_ids": input_ids,
            "attention_mask": attention_mask,
        }
        img, txt, _ = model.apply(params, batch, deterministic=True)
        return img.astype(jnp.float32), txt.astype(jnp.float32)

    imgs, txts, iids, cids = [], [], [], []
    for batch in loader:
        img, txt = embed(
            params,
            jnp.asarray(batch["image"]),
            jnp.asarray(batch["input_ids"]),
            jnp.asarray(batch["attention_mask"]),
        )
        imgs.append(np.asarray(img))
        txts.append(np.asarray(txt))
        iids.append(np.asarray(batch["image_id"]))
        cids.append(np.asarray(batch["caption_id"]))

    summary = retrieval_summary(
        np.concatenate(imgs), np.concatenate(txts),
        np.concatenate(iids), np.concatenate(cids),
    )
    pretty = " ".join(f"{k}: {v:.4f}" for k, v in summary.items())
    logger.emph(pretty)
    return summary


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
        from simseg_tpu.checkpoint.torch_bridge import load_clip_checkpoint

        params, _ = load_clip_checkpoint(
            args.ckpt_path, params, projection=cfg.model.projection.name
        )
        logger.emph(f"Loaded ckpt path: {args.ckpt_path}")
    else:
        logger.warning("No --ckpt_path: evaluating randomly initialized weights")

    tokenizer = build_tokenizer(cfg.model.text_encoder.tag,
                                vocab_file=args.vocab_file or None)
    tf = build_transforms(cfg, "valid")
    for name in cfg.data.valid_name:
        logger.info(f"Evaluating retrieval on {name}")
        ds = ParquetRetrievalDataset(cfg, name, tokenizer, tf)
        loader = DataLoader(ds, cfg.data.batch_size_val,
                            num_workers=cfg.data.num_workers)
        evaluate_benchmark(loader, model, params, cfg)


if __name__ == "__main__":
    main()
