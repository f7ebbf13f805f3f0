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
from simseg_tpu.data.transforms import build_transforms
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


def evaluate_benchmark(loader, model, params, cfg, mesh=None) -> dict:
    """parity: reference :65-99 — collect embeddings, summarize.

    mesh: shard the batch over the data mesh so one jit spans all local
    chips (multi-chip eval; ragged final batches are padded to the compiled
    shape and the padded rows dropped)."""
    import jax
    import jax.numpy as jnp

    img_q = dict(model.image_arch or ()).get("quant", "none") or "none"
    txt_q = dict(model.text_arch or ()).get("quant", "none") or "none"
    if img_q != "none" or txt_q != "none":
        # cache int8 weights / calibrate static activation scales on the
        # first batch BEFORE the embed fn compiles (ops/quant.py); process 0
        # wins under multi-process (prepare in tasks/seg_eval broadcasts)
        from simseg_tpu.ops.quant import cache_quant_state

        first = next(iter(loader))
        calls = []
        if img_q != "none":
            calls.append(((jnp.asarray(first["image"]),),
                          {"method": lambda m, im: m.forward_image_tokens(im)}))
        if txt_q != "none":
            calls.append(((jnp.asarray(first["input_ids"]),
                           jnp.asarray(first["attention_mask"])),
                          {"method":
                           lambda m, i, a: m.forward_text_feature(i, a)}))
        params = cache_quant_state(model, params, calls)
        if jax.process_count() > 1:
            from simseg_tpu.parallel.collectives import broadcast_object

            quant_host = jax.tree.map(lambda a: np.asarray(a),
                                      params["quant"])
            params = {**params, "quant": jax.tree.map(
                jnp.asarray, broadcast_object(quant_host))}

    # the exact graph the serving artifact exports — one definition, so the
    # served embeddings and the evaluated metric cannot drift
    from simseg_tpu.serving import make_embed_fn

    embed_fn = make_embed_fn(model, params, cfg, bake_weights=False)

    full_batch = getattr(loader, "batch_size", None)
    from simseg_tpu.parallel.mesh import data_sharding, eval_mesh, replicated

    mesh = eval_mesh(mesh, full_batch)
    if mesh is not None:
        embed = jax.jit(
            embed_fn,
            in_shardings=(replicated(mesh),) + (data_sharding(mesh),) * 3,
            out_shardings=(data_sharding(mesh),) * 2,
        )
    else:
        embed = jax.jit(embed_fn)

    imgs, txts, iids, cids = [], [], [], []
    for batch in loader:
        images = np.asarray(batch["image"])
        ids = np.asarray(batch["input_ids"])
        masks = np.asarray(batch["attention_mask"])
        b = images.shape[0]
        if full_batch and b < full_batch:
            # pad the ragged final batch to the compiled (shardable) shape;
            # padded rows are dropped below (id arrays stay unpadded)
            pad = full_batch - b
            images = np.concatenate([images, np.repeat(images[:1], pad, 0)])
            ids = np.concatenate([ids, np.repeat(ids[:1], pad, 0)])
            masks = np.concatenate([masks, np.repeat(masks[:1], pad, 0)])
        img, txt = embed(params, jnp.asarray(images), jnp.asarray(ids),
                         jnp.asarray(masks))
        imgs.append(np.asarray(img)[:b])
        txts.append(np.asarray(txt)[:b])
        iids.append(np.asarray(batch["image_id"]))
        cids.append(np.asarray(batch["caption_id"]))

    if not imgs:
        # empty process shard (len(dataset) < process_count): still join
        # the gather below with zero rows, or the peers would hang in
        # process_allgather waiting for this process
        dim = int(cfg.model.projection.dim)
        imgs = [np.zeros((0, dim), np.float32)]
        txts = [np.zeros((0, dim), np.float32)]
        iids = [np.zeros((0,), np.int64)]
        cids = [np.zeros((0,), np.int64)]
    img_all = np.concatenate(imgs)
    txt_all = np.concatenate(txts)
    iid_all = np.concatenate(iids)
    cid_all = np.concatenate(cids)
    if jax.process_count() > 1:
        # per-process loader shards: gather every process's embeddings so
        # each reports the full-set RSUM (reference eval-hook all_gather,
        # tasks/clip/hooks/eval.py:32-39). Shard sizes can differ by one
        # batch — pad to the global max with id -1 rows and drop them after
        # (the reference's padding-row convention, eval.py:32-33).
        from simseg_tpu.parallel.collectives import process_allgather

        n = img_all.shape[0]
        n_max = int(process_allgather(np.asarray([n])).max())
        if n_max > n:
            pad = n_max - n
            img_all = np.concatenate(
                [img_all, np.zeros((pad, img_all.shape[1]), img_all.dtype)])
            txt_all = np.concatenate(
                [txt_all, np.zeros((pad, txt_all.shape[1]), txt_all.dtype)])
            iid_all = np.concatenate([iid_all, np.full(pad, -1, iid_all.dtype)])
            cid_all = np.concatenate([cid_all, np.full(pad, -1, cid_all.dtype)])
        img_all = process_allgather(img_all).reshape(-1, img_all.shape[-1])
        txt_all = process_allgather(txt_all).reshape(-1, txt_all.shape[-1])
        iid_all = process_allgather(iid_all).reshape(-1)
        cid_all = process_allgather(cid_all).reshape(-1)
        keep = iid_all >= 0
        img_all, txt_all = img_all[keep], txt_all[keep]
        iid_all, cid_all = iid_all[keep], cid_all[keep]

    summary = retrieval_summary(img_all, txt_all, iid_all, cid_all)
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
        from simseg_tpu.checkpoint import load_pretrained_params

        params = load_pretrained_params(args.ckpt_path, params, cfg)
        logger.emph(f"Loaded ckpt path: {args.ckpt_path}")
    else:
        logger.warning("No --ckpt_path: evaluating randomly initialized weights")

    from simseg_tpu.parallel import make_mesh

    mesh = make_mesh() if len(jax.devices()) > 1 else None

    tokenizer = build_tokenizer(cfg.model.text_encoder.tag,
                                vocab_file=args.vocab_file or None)
    from simseg_tpu.data.datasets import _process_shard

    shard, nshards = _process_shard()
    tf = build_transforms(cfg, "valid")
    for name in cfg.data.valid_name:
        logger.info(f"Evaluating retrieval on {name}")
        ds = ParquetRetrievalDataset(cfg, name, tokenizer, tf)
        loader = DataLoader(ds, cfg.data.batch_size_val,
                            num_workers=cfg.data.num_workers,
                            shard_index=shard, shard_count=nshards)
        evaluate_benchmark(loader, model, params, cfg, mesh=mesh)


if __name__ == "__main__":
    main()
