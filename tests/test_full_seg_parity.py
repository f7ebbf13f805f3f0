"""End-to-end zero-shot segmentation parity: the fused TPU pipeline vs a
faithful torch+numpy+cv2 re-derivation of the reference eval loop
(tools/seg_evaluation.py semantics), sharing bridged weights. This is the
closest possible stand-in for dataset mIoU parity without the actual
benchmark data: every stage (towers, prompts, threshold, CRF at stride 1,
morphology, GT resize, confusion accumulation) must agree.
"""

import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F
from PIL import Image

from simseg_tpu.config import new_base_cfg, update_cfg
from simseg_tpu.checkpoint.torch_bridge import load_clip_checkpoint
from simseg_tpu.data.datasets import build_seg_valid_loader
from simseg_tpu.data.tokenizer import WordPieceTokenizer, make_test_vocab
from simseg_tpu.tasks.clip.config import task_cfg_init_fn
from simseg_tpu.tasks.seg_eval import evaluate_benchmark, zero_shot_classifier
from simseg_tpu.utils.prompts import openai_imagenet_template
from tests.test_crf_morphology import np_dense_crf
from tests.test_models import tiny_clip
from tests.torch_reference import TorchTinyCLIP, torch_topk_pool

CLASSES = ["background", "dog", "cat", "bird"]
SIZE = 32
PATCH = 8
GRID = SIZE // PATCH
TOP_K = 3
CANDIDATES = 3


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("parity")
    # VOC fixture with two variable-size images
    root = tmp_path / "VOCdevkit" / "VOC2012"
    (root / "JPEGImages").mkdir(parents=True)
    (root / "SegmentationClass").mkdir()
    (root / "ImageSets" / "Segmentation").mkdir(parents=True)
    rng = np.random.default_rng(0)
    names, sizes = [], [(40, 50), (48, 36)]
    for i, (h, w) in enumerate(sizes):
        n = f"2007_{i:06d}"
        names.append(n)
        img = np.zeros((h, w, 3), np.uint8)
        img[:, : w // 2] = [200, 60, 50]
        img[:, w // 2:] = [40, 60, 210]
        img += rng.integers(0, 20, img.shape).astype(np.uint8)
        Image.fromarray(img).save(root / "JPEGImages" / f"{n}.jpg")
        label = rng.integers(0, 4, (h, w)).astype(np.uint8)
        Image.fromarray(label).save(root / "SegmentationClass" / f"{n}.png")
    (root / "ImageSets" / "Segmentation" / "val.txt").write_text("\n".join(names))

    cfg = update_cfg(task_cfg_init_fn, None, argv=[
        f"data.data_path={tmp_path}/",
        "data.batch_size_val=1",
        "data.num_workers=1",
        "model.max_length=12",
        "transforms.input_size=32",
        "transforms.resize.size=32",
        "transforms.valid_transforms=[resize]",
        "seg_eval.bilateral_stride=1",   # exact CRF for the parity check
        "seg_eval.crf_backend=xla",
    ], target=new_base_cfg())

    # bridged weights: torch model is ground truth
    torch.manual_seed(0)
    tmodel = TorchTinyCLIP()
    with torch.no_grad():
        for p in tmodel.parameters():
            if p.ndim > 0:
                p.add_(torch.randn_like(p) * 0.02)
    ckpt = tmp_path / "tiny.pth"
    torch.save({"state_dict": tmodel.state_dict()}, ckpt)

    fmodel = tiny_clip()
    dummy = {
        "image": jnp.zeros((1, SIZE, SIZE, 3)),
        "input_ids": jnp.zeros((1, 12), jnp.int32),
        "attention_mask": jnp.ones((1, 12), jnp.int32),
    }
    params = fmodel.init(jax.random.key(0), dummy)
    params, report = load_clip_checkpoint(str(ckpt), params)
    assert not report["missing"] and not report["mismatched"]

    tok = WordPieceTokenizer(make_test_vocab(
        CLASSES + ["a", "photo", "of", "the", "many", "see", "hard", "to"]
    ))
    return cfg, tmodel, fmodel, params, tok, tmp_path


def torch_reference_eval(cfg, tmodel, tok, tmp_path):
    """Reference evaluate_benchmark re-derived (seg_evaluation.py:78-177)."""
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)

    # zero-shot classifier (:57-75)
    bank = []
    with torch.no_grad():
        for cls in CLASSES:
            enc = tok(openai_imagenet_template(cls), padding="max_length",
                      truncation=True, max_length=12)
            ids = torch.tensor(enc["input_ids"])
            msk = torch.tensor(enc["attention_mask"])
            tokens = tmodel.text_encoder.model(ids, msk)
            emb = torch_topk_pool(tmodel.text_projection.linear(tokens), 1, msk)
            emb = F.normalize(emb, dim=-1)
            e = emb.mean(0)
            bank.append((e / e.norm()).numpy())
    bank = np.stack(bank)  # (C, D)

    loader = build_seg_valid_loader(cfg, "pascal_voc")
    total_i = np.zeros(len(CLASSES))
    total_u = np.zeros(len(CLASSES))
    for batch in loader:
        img_u8 = batch["image"][0]  # (32, 32, 3) uint8
        label = batch["mask_label"][0]
        x = (img_u8.astype(np.float32) / 255.0 - mean) / std
        xt = torch.tensor(x.transpose(2, 0, 1))[None]
        with torch.no_grad():
            tokens = tmodel.image_encoder.model.model(xt)[:, 1:]
            proj = tmodel.image_projection.linear(tokens)
            pooled = torch_topk_pool(proj, 3)
            pooled = F.normalize(pooled, dim=-1)[0].numpy()
            dense = F.normalize(proj, dim=-1)[0].numpy()  # (16, D)

        scores = bank @ pooled
        order = np.argsort(-scores)[:TOP_K]
        top = scores[order]
        threshold = top.mean() + top.std(ddof=1)

        raw_h, raw_w = label.shape
        temp_pred = np.zeros((len(CLASSES), raw_h, raw_w))
        for idx in order[:CANDIDATES]:
            if idx in (0, 255):
                continue
            if scores[idx] < threshold:
                break
            attn = (dense @ bank[idx]).reshape(GRID, GRID)
            attn = attn.repeat(PATCH, 0).repeat(PATCH, 1)  # nearest x8
            norm_attn = (attn - attn.min()) / (attn.max() - attn.min())
            binary = np_dense_crf(norm_attn, img_u8.astype(np.float64)) * 255
            kernel = np.ones((7, 7), np.uint8)
            m = cv2.dilate(binary.astype(np.uint8), kernel)
            m = cv2.erode(m, kernel)
            m = cv2.resize(m, (raw_w, raw_h), interpolation=cv2.INTER_NEAREST)
            temp_pred[idx] = m * scores[idx]

        pred = temp_pred.argmax(0)
        valid = label != 255
        for c in range(len(CLASSES)):
            pi = (pred == c) & valid
            li = (label == c) & valid
            inter = np.sum(pi & li)
            total_i[c] += inter
            total_u[c] += pi.sum() + li.sum() - inter
    return total_i, total_u


def test_full_pipeline_matches_torch_reference(setup):
    cfg, tmodel, fmodel, params, tok, tmp_path = setup

    want_i, want_u = torch_reference_eval(cfg, tmodel, tok, tmp_path)

    loader = build_seg_valid_loader(cfg, "pascal_voc")
    iou, miou = evaluate_benchmark(
        loader, fmodel, params, cfg, tok, CLASSES, top_cls_num=TOP_K,
        dataset_name="pascal_voc",
    )
    with np.errstate(divide="ignore", invalid="ignore"):
        want_iou = want_i / want_u
    got = np.asarray(iou)
    same = np.isnan(got) == np.isnan(want_iou)
    assert same.all(), (got, want_iou)
    np.testing.assert_allclose(
        np.nan_to_num(got), np.nan_to_num(want_iou), rtol=1e-3, atol=1e-4
    )
    assert miou == pytest.approx(float(np.nanmean(want_iou)), rel=1e-3)


def test_zero_shot_classifier_matches_torch(setup):
    cfg, tmodel, fmodel, params, tok, _ = setup
    got = zero_shot_classifier(fmodel, params, CLASSES, tok, max_length=12)
    with torch.no_grad():
        for i, cls in enumerate(CLASSES):
            enc = tok(openai_imagenet_template(cls), padding="max_length",
                      truncation=True, max_length=12)
            tokens = tmodel.text_encoder.model(
                torch.tensor(enc["input_ids"]), torch.tensor(enc["attention_mask"])
            )
            emb = torch_topk_pool(
                tmodel.text_projection.linear(tokens), 1,
                torch.tensor(enc["attention_mask"]),
            )
            emb = F.normalize(emb, dim=-1).mean(0)
            want = (emb / emb.norm()).numpy()
            np.testing.assert_allclose(got[i], want, rtol=1e-4, atol=1e-5)
