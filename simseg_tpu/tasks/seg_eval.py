"""Zero-shot semantic segmentation evaluation core.

Parity: reference ``tools/seg_evaluation.py`` —
- zero_shot_classifier (:57-75): per class, embed the 80 OpenAI prompts
  through the text tower, mean, L2-normalize
- evaluate_benchmark (:78-181): per-image decode (here the fused on-device
  kernel from ops/seg_decode) + GT-size nearest resize + mIoU accumulation
- dataset specifics (:240-250): label bank files, top_cls_num = 30 for
  pascal_context else 10, batch_size_val images at a time.

The whole per-batch path (two tower forwards + CRF decode + confusion
accumulation) is jitted; the host only feeds uint8 images and pulls back
two (C,) histograms per batch.
"""

from __future__ import annotations

import os
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from simseg_tpu.data.transforms import normalize_images
from simseg_tpu.ops.morphology import resize_nearest_to_padded
from simseg_tpu.ops.pooling import l2_normalize
from simseg_tpu.ops.seg_decode import make_seg_decode_fn
from simseg_tpu.utils.logger import logger
from simseg_tpu.utils.metrics import intersect_and_union, miou_from_totals
from simseg_tpu.utils.prompts import openai_imagenet_template

# per-dataset max GT canvas (pixels); labels are padded with 255 (ignored)
GT_CANVAS = {"pascal_voc": 512, "pascal_context": 512, "coco_stuff": 640}


def load_label_bank(name: str, data_root: str = "data") -> List[str]:
    """Class-name list for a seg benchmark (parity: the reference reads
    ``data/label_category/<name>.txt`` relative to the working directory,
    tools/seg_evaluation.py:243-245). A copy of the canonical banks ships
    as package data, used when the data_root layout doesn't carry one —
    e.g. a pip-installed framework pointed straight at a dataset tree."""
    path = os.path.join(data_root, "label_category", f"{name}.txt")
    if not os.path.exists(path):
        packaged = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "data", "label_category",
            f"{name}.txt")
        if os.path.exists(packaged):
            logger.warning(
                f"label bank not found at {path!r}; falling back to the "
                f"packaged canonical {name} bank — if you meant to supply "
                "a custom class list, fix data_root"
            )
            path = packaged
    with open(path) as f:
        return [l.strip() for l in f if l.strip()]


def zero_shot_classifier(model, params, classnames: Sequence[str], tokenizer,
                         max_length: int = 25) -> np.ndarray:
    """(C, D) L2-normalized class embeddings (parity: :57-75).

    params must be an explicit jit argument — closing over them would bake
    hundreds of MB of weights into the HLO as constants.
    """

    @jax.jit
    def embed(params, input_ids, attention_mask):
        feats = model.apply(
            params, input_ids, attention_mask,
            method=lambda m, i, a: m.forward_text_feature(i, a),
        )
        emb = model.apply(
            params, feats, attention_mask,
            method=lambda m, f, a: m.forward_text_project(f, a),
        )
        mean = jnp.mean(emb, axis=0)
        return mean / jnp.linalg.norm(mean)

    out = []
    for cls in classnames:
        texts = openai_imagenet_template(cls)
        enc = tokenizer(texts, padding="max_length", truncation=True,
                        max_length=max_length)
        out.append(np.asarray(embed(
            params,
            jnp.asarray(enc["input_ids"], jnp.int32),
            jnp.asarray(enc["attention_mask"], jnp.int32),
        )))
    return np.stack(out)


def prepare_quant_params(model, params, cfg, calib_images_u8=None,
                         tokenizer=None, classnames: Sequence[str] = ()):
    """Populate the int8 weight cache — and, for ``int8_static``, the
    activation calibration — BEFORE any jitted eval fn compiles, so the
    param-tree structure (the extra ``'quant'`` collection) is fixed up
    front and the per-batch forward never re-quantizes the f32 weights
    (ops/quant.py). No-op for unquantized models.

    calib_images_u8: (N, S, S, 3) uint8 batch in the eval pipeline's raw
    format (normalized here exactly like the eval forward). Required for
    ``int8_static`` on the image tower; plain ``int8`` caches from a zeros
    dummy (weights don't depend on activations). The text tower calibrates
    on the actual prompt bank it will embed.
    """
    img_q = dict(model.image_arch or ()).get("quant", "none") or "none"
    txt_q = dict(model.text_arch or ()).get("quant", "none") or "none"
    if img_q == "none" and txt_q == "none":
        return params

    from simseg_tpu.ops.quant import cache_quant_state

    size = cfg.transforms.input_size
    calls = []
    if img_q != "none":
        if calib_images_u8 is not None:
            imgs = normalize_images(jnp.asarray(calib_images_u8),
                                    tuple(cfg.transforms.normalize.mean),
                                    tuple(cfg.transforms.normalize.std))
        elif img_q == "int8_static":
            raise ValueError(
                "quant='int8_static' on the image tower needs calibration "
                "images (pass calib_images_u8)")
        else:
            imgs = jnp.zeros((1, size, size, 3), jnp.float32)
        calls.append(((imgs,),
                      {"method": lambda m, im: m.forward_image_tokens(im)}))
    if txt_q != "none":
        if tokenizer is not None and classnames:
            texts = []
            for cls in list(classnames)[:4]:
                texts.extend(openai_imagenet_template(cls))
            enc = tokenizer(texts, padding="max_length", truncation=True,
                            max_length=cfg.model.max_length)
            ids = jnp.asarray(enc["input_ids"], jnp.int32)
            mask = jnp.asarray(enc["attention_mask"], jnp.int32)
        elif txt_q == "int8_static":
            raise ValueError(
                "quant='int8_static' on the text tower needs the tokenizer "
                "+ classnames for prompt-bank calibration")
        else:
            ids = jnp.zeros((1, cfg.model.max_length), jnp.int32)
            mask = jnp.ones((1, cfg.model.max_length), jnp.int32)
        calls.append(((ids, mask),
                      {"method": lambda m, i, a: m.forward_text_feature(i, a)}))
    logger.info(f"Caching int8 weights (image={img_q}, text={txt_q})")
    out = cache_quant_state(model, params, calls)
    if jax.process_count() > 1:
        # per-process calibration batches differ (sharded loaders); one
        # calibration must win or every process embeds with different
        # scales — broadcast process 0's derived collection
        from simseg_tpu.parallel.collectives import broadcast_object

        quant_host = jax.tree.map(lambda a: np.asarray(a), out["quant"])
        out = {**out, "quant": jax.tree.map(
            jnp.asarray, broadcast_object(quant_host))}
    return out


def image_patch_stride(model) -> int:
    """Spatial stride of the dense feature grid: the ViT patch size (resolved
    through the same tag-table/timm-pattern/arch-override path the model
    builder uses), or the total conv stride (32) for CNN backbones (reference
    fixes 16 at ``tools/seg_evaluation.py:99``; we derive it so any tag
    works)."""
    from simseg_tpu.models.vit import resolve_vit_config

    if "vit" in model.image_tag:
        spec = resolve_vit_config(model.image_tag, dict(model.image_arch or ()))
        return spec["patch_size"]
    return 32


def make_seg_predict(model, cfg, num_classes: int, top_cls_num: int,
                     patch_size: int = 16):
    """The full prediction pipeline as one pure fn:
    ``(params, images_u8, text_bank) -> (pred, conf)`` — device-side
    normalization, towers (multi-scale / sliding-window per
    ``cfg.seg_eval``), and the similarity/CRF/morphology decode. Shared by
    ``make_seg_forward`` (which adds mIoU accumulation) and the serving
    export (simseg_tpu/serving.py), so the exported artifact runs exactly
    the evaluated pipeline.

    Multi-scale dense inference (``cfg.seg_eval.scales``): the image is also
    encoded at scaled resolutions; each scale's patch-token feature grid is
    bilinearly resampled onto the base grid and averaged (features), and the
    pooled embeddings are averaged, before the single decode pass. With the
    default ``[1.0]`` this is exactly the reference's single-scale pipeline.
    """
    input_size = cfg.transforms.input_size
    mean = tuple(cfg.transforms.normalize.mean)
    std = tuple(cfg.transforms.normalize.std)
    seg_cfg = cfg.get("seg_eval", {}) or {}
    scales = tuple(seg_cfg.get("scales", [1.0]))
    decode = make_seg_decode_fn(
        num_classes=num_classes,
        image_size=input_size,
        patch_size=patch_size,
        top_cls_num=top_cls_num,
        candidate_classes=5,
        bilateral_stride=seg_cfg.get("bilateral_stride", 8),
        crf_backend=seg_cfg.get("crf_backend", "auto"),
        compute_dtype=seg_cfg.get("crf_dtype", "auto"),
    )
    base_grid = input_size // patch_size

    win_size = int(seg_cfg.get("window", {}).get("size", -1))
    win_stride = int(seg_cfg.get("window", {}).get("stride", -1))
    use_window = win_size > 0 and win_size < input_size

    def _tower(params, images):
        tokens = model.apply(
            params, images, method=lambda m, im: m.forward_image_tokens(im)
        )
        patches = tokens[:, 1:]
        pooled = model.apply(
            params, patches, method=lambda m, t: m.forward_image_project(t)
        )
        dense = model.apply(
            params, patches, method=lambda m, t: m.project_image_tokens(t)
        )
        return dense.astype(jnp.float32), pooled.astype(jnp.float32)

    def _sliding_tower(params, images):
        """Sliding-window dense inference: 'win_size' crops at 'win_stride',
        per-window patch features scatter-averaged onto the full grid
        (static window positions -> fully unrolled under jit)."""
        b = images.shape[0]
        stride = win_stride if win_stride > 0 else win_size
        starts = sorted({
            min(y, input_size - win_size)
            for y in range(0, input_size - win_size + stride, stride)
        })
        wg = win_size // patch_size  # window grid
        d = None
        feat_grid = counts = None
        pooled_acc = None
        n_windows = 0
        for y0 in starts:
            for x0 in starts:
                crop = jax.lax.dynamic_slice(
                    images, (0, y0, x0, 0), (b, win_size, win_size, 3)
                )
                dense_w, pooled_w = _tower(params, crop)
                if feat_grid is None:
                    d = dense_w.shape[-1]
                    feat_grid = jnp.zeros((b, base_grid, base_grid, d), jnp.float32)
                    counts = jnp.zeros((1, base_grid, base_grid, 1), jnp.float32)
                    pooled_acc = jnp.zeros_like(pooled_w)
                gy, gx = y0 // patch_size, x0 // patch_size
                patch = dense_w.reshape(b, wg, wg, d)
                feat_grid = jax.lax.dynamic_update_slice(
                    feat_grid,
                    jax.lax.dynamic_slice(
                        feat_grid, (0, gy, gx, 0), (b, wg, wg, d)
                    ) + patch,
                    (0, gy, gx, 0),
                )
                ones = jnp.ones((1, wg, wg, 1), jnp.float32)
                counts = jax.lax.dynamic_update_slice(
                    counts,
                    jax.lax.dynamic_slice(counts, (0, gy, gx, 0), (1, wg, wg, 1))
                    + ones,
                    (0, gy, gx, 0),
                )
                pooled_acc = pooled_acc + pooled_w
                n_windows += 1
        dense = (feat_grid / jnp.maximum(counts, 1.0)).reshape(b, -1, d)
        # window MEAN of per-window pooled embeddings; predict re-normalizes
        # where needed so views mix at equal magnitude (see below)
        return dense, pooled_acc / n_windows

    def predict(params, images_u8, text_bank):
        images = normalize_images(images_u8, mean, std)
        multi_scale = len(scales) > 1 or scales[0] != 1.0
        if use_window:
            dense, pooled = _sliding_tower(params, images)
            if multi_scale and model.projection_name == "simple":
                # each window's pooled is unit-norm (forward_image_project
                # L2-normalizes for the simple projection), so the window
                # MEAN has norm <= 1 while each scale view below is exactly
                # unit-norm — re-normalize so all views enter the
                # multi-scale average at the same magnitude. (complex
                # projection: every view is raw, already magnitude-matched)
                pooled = l2_normalize(pooled)
        else:
            dense, pooled = _tower(params, images)
        if multi_scale:
            b, _, d = dense.shape
            dense_acc = dense if 1.0 in scales else jnp.zeros_like(dense)
            pooled_acc = pooled if 1.0 in scales else jnp.zeros_like(pooled)
            n_used = 1 if 1.0 in scales else 0
            for scale in scales:
                if scale == 1.0:
                    continue
                # snap the scaled size to the patch grid
                size_s = max(int(round(input_size * scale / patch_size)), 1) * patch_size
                grid_s = size_s // patch_size
                imgs_s = jax.image.resize(
                    images, (b, size_s, size_s, 3), method="bilinear"
                )
                dense_s, pooled_s = _tower(params, imgs_s)
                grid_feats = dense_s.reshape(b, grid_s, grid_s, d)
                grid_feats = jax.image.resize(
                    grid_feats, (b, base_grid, base_grid, d), method="bilinear"
                )
                dense_acc = dense_acc + grid_feats.reshape(b, -1, d)
                pooled_acc = pooled_acc + pooled_s
                n_used += 1
            dense = dense_acc / n_used
            pooled = l2_normalize(pooled_acc / n_used)
        elif use_window:
            pooled = l2_normalize(pooled)
        dense = l2_normalize(dense)
        return decode(dense, pooled, jnp.asarray(text_bank), images_u8)

    return predict


def make_seg_forward(model, cfg, num_classes: int, top_cls_num: int,
                     canvas: int, patch_size: int = 16, mesh=None,
                     return_pred: bool = False):
    """One jitted fn: images -> (intersection, union) histograms
    (``make_seg_predict`` + per-image mIoU confusion accumulation).

    mesh: shard the batch dim over the mesh's data axes — on a multi-chip
    host one jit spans all chips and the per-class histograms come back
    replicated (XLA inserts the cross-chip reduction for the batch sum).

    return_pred: additionally return the per-image GT-canvas class maps
    (B, canvas, canvas) — used by the production-parity harness
    (tools/seg_parity.py), which compares pixel-level predictions."""
    predict = make_seg_predict(model, cfg, num_classes, top_cls_num,
                               patch_size)

    def forward(params, images_u8, text_bank, labels_padded, gt_h, gt_w):
        pred, _ = predict(params, images_u8, text_bank)

        # per-image: nearest resize to GT size inside the padded canvas,
        # then confusion accumulation (parity: :161-177)
        def one(pred_i, label_i, h, w):
            resized = resize_nearest_to_padded(pred_i, h, w, canvas, canvas,
                                               fill=0)
            inter, union, _, _ = intersect_and_union(resized, label_i,
                                                     num_classes, 255)
            return resized, inter, union

        resized, inter, union = jax.vmap(one)(pred, labels_padded, gt_h, gt_w)
        if return_pred:
            return jnp.sum(inter, axis=0), jnp.sum(union, axis=0), resized
        return jnp.sum(inter, axis=0), jnp.sum(union, axis=0)

    if mesh is not None:
        from simseg_tpu.parallel.mesh import data_sharding, replicated

        data = data_sharding(mesh)
        repl = replicated(mesh)
        return jax.jit(
            forward,
            in_shardings=(repl, data, repl, data, data, data),
            out_shardings=(repl, repl, data) if return_pred else (repl, repl),
        )
    return jax.jit(forward)


def evaluate_benchmark(loader, model, params, cfg, tokenizer,
                       seg_categories: Sequence[str], top_cls_num: int,
                       dataset_name: str, mesh=None) -> Tuple[np.ndarray, float]:
    """Full dataset mIoU (parity: :78-181). Returns (per-class IoU, mIoU).

    mesh: multi-chip batch sharding (see make_seg_forward) — used when the
    compiled batch divides the mesh's data shards, else single-device."""
    num_classes = len(seg_categories)
    canvas = GT_CANVAS.get(dataset_name, 640)
    dataset = getattr(loader, "dataset", None)
    if dataset is not None and hasattr(dataset, "max_label_size"):
        # pre-scan GT sizes (PNG headers only) and auto-raise the canvas so
        # an oversized label grows the compiled shape up front instead of
        # raising mid-dataset after minutes of eval
        mh, mw = dataset.max_label_size()
        need = max(mh, mw)
        if need > canvas:
            new_canvas = int(-(-need // 64) * 64)  # round up to 64
            logger.warning(
                f"{dataset_name} GT labels reach {need}px > the {canvas}px "
                f"canvas; raising the padded canvas to {new_canvas}px"
            )
            canvas = new_canvas
    # int8 towers: cache quantized weights (and calibrate static activation
    # scales) before anything compiles. Calibration sweeps the first
    # SIMSEG_CALIB_IMAGES (default 32) real images with a running absmax —
    # a single batch measurably under-covers the activation range and the
    # resulting clipping perturbs the candidate-threshold scores
    # (tools/seg_parity.py --quant int8_static).
    img_q = dict(model.image_arch or ()).get("quant", "none") or "none"
    calib = None
    if img_q == "int8_static":
        want = int(os.environ.get("SIMSEG_CALIB_IMAGES", "32") or 32)
        chunks, have = [], 0
        for batch in loader:
            chunks.append(np.asarray(batch["image"]))
            have += chunks[-1].shape[0]
            if have >= want:
                break
        calib = np.concatenate(chunks, axis=0)[:want]
    params = prepare_quant_params(model, params, cfg, calib_images_u8=calib,
                                  tokenizer=tokenizer,
                                  classnames=seg_categories)

    logger.info(f"Building zero-shot classifier for {num_classes} classes")
    text_bank = zero_shot_classifier(model, params, seg_categories, tokenizer,
                                     max_length=cfg.model.max_length)

    full_batch = getattr(loader, "batch_size", None)
    from simseg_tpu.parallel.mesh import eval_mesh

    mesh = eval_mesh(mesh, full_batch)
    forward = make_seg_forward(model, cfg, num_classes, top_cls_num, canvas,
                               patch_size=image_patch_stride(model),
                               mesh=mesh)

    total_i = np.zeros((num_classes,), np.float64)
    total_u = np.zeros((num_classes,), np.float64)
    count = 0
    for batch in loader:
        images = batch["image"]  # uint8 (B, S, S, 3)
        labels = batch["mask_label"]  # (B, H, W), 255-padded if sizes varied
        b = images.shape[0]
        gt_h = np.asarray(batch.get("mask_h", [labels.shape[1]] * b), np.int32)
        gt_w = np.asarray(batch.get("mask_w", [labels.shape[2]] * b), np.int32)
        if full_batch and b < full_batch:
            # pad the ragged final batch to the compiled shape; padded rows
            # carry all-255 labels so they contribute nothing
            pad = full_batch - b
            images = np.concatenate(
                [images, np.zeros((pad,) + images.shape[1:], images.dtype)]
            )
            labels = np.concatenate(
                [labels, np.full((pad,) + labels.shape[1:], 255, labels.dtype)]
            )
            gt_h = np.concatenate([gt_h, np.ones(pad, np.int32)])
            gt_w = np.concatenate([gt_w, np.ones(pad, np.int32)])
        if labels.shape[1] > canvas or labels.shape[2] > canvas:
            raise ValueError(
                f"GT size {labels.shape[1:]} exceeds the {canvas} canvas for "
                f"{dataset_name}; raise GT_CANVAS"
            )
        padded = np.full((labels.shape[0], canvas, canvas), 255, np.int32)
        padded[:, :labels.shape[1], :labels.shape[2]] = labels
        inter, union = forward(
            params, jnp.asarray(images), text_bank, jnp.asarray(padded),
            jnp.asarray(gt_h), jnp.asarray(gt_w),
        )
        total_i += np.asarray(inter, np.float64)
        total_u += np.asarray(union, np.float64)
        count += b

    if jax.process_count() > 1:
        # per-process loader shards (build_seg_valid_loader): sum the
        # histograms across processes so every process reports the full-set
        # mIoU (the reference's eval-hook all_gather,
        # tasks/clip/hooks/eval.py:32-39)
        from simseg_tpu.parallel.collectives import process_allgather

        total_i = np.sum(process_allgather(total_i), axis=0)
        total_u = np.sum(process_allgather(total_u), axis=0)
        count = int(np.sum(process_allgather(np.asarray([count]))))

    iou, miou = miou_from_totals(total_i, total_u)
    print(f"---------------- {count} samples evaluated. ----------------")
    logger.emph(f"multi class iou: {np.round(iou, 4)}")
    logger.emph(f"final mean iou: {miou:.4f}")
    return iou, miou
