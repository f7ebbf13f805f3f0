"""End-to-end seg evaluation task on a synthetic VOC-layout fixture."""

import jax
import numpy as np
import pytest
from PIL import Image

from simseg_tpu.config import new_base_cfg, update_cfg
from simseg_tpu.data.datasets import build_seg_valid_loader
from simseg_tpu.data.tokenizer import WordPieceTokenizer, make_test_vocab
from simseg_tpu.tasks.clip.config import task_cfg_init_fn
from simseg_tpu.tasks.seg_eval import (
    evaluate_benchmark,
    load_label_bank,
    zero_shot_classifier,
)
from tests.test_models import tiny_clip


@pytest.fixture
def voc_fixture(tmp_path):
    root = tmp_path / "VOCdevkit" / "VOC2012"
    (root / "JPEGImages").mkdir(parents=True)
    (root / "SegmentationClass").mkdir()
    (root / "ImageSets" / "Segmentation").mkdir(parents=True)
    rng = np.random.default_rng(0)
    names = []
    sizes = [(45, 55), (50, 40)]  # variable GT sizes exercise pad-collate
    for i, (h, w) in enumerate(sizes):
        n = f"2007_{i:06d}"
        names.append(n)
        Image.fromarray(rng.integers(0, 255, (h, w, 3), np.uint8)).save(
            root / "JPEGImages" / f"{n}.jpg"
        )
        label = rng.integers(0, 4, (h, w)).astype(np.uint8)
        label[0, :5] = 255  # ignore region
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
    ], target=new_base_cfg())
    return cfg, tmp_path


def test_zero_shot_classifier_shapes():
    tok = WordPieceTokenizer(make_test_vocab(
        ["a", "photo", "of", "the", "dog", "cat", "background"]
    ))
    model = tiny_clip()
    import jax.numpy as jnp

    dummy = {
        "image": jnp.zeros((1, 32, 32, 3)),
        "input_ids": jnp.zeros((1, 12), jnp.int32),
        "attention_mask": jnp.ones((1, 12), jnp.int32),
    }
    params = model.init(jax.random.key(0), dummy)
    bank = zero_shot_classifier(model, params, ["dog", "cat"], tok, max_length=12)
    assert bank.shape == (2, 16)
    np.testing.assert_allclose(np.linalg.norm(bank, axis=1), 1.0, rtol=1e-5)


def test_evaluate_benchmark_runs(voc_fixture):
    cfg, tmp_path = voc_fixture
    tok = WordPieceTokenizer(make_test_vocab(
        ["a", "photo", "of", "the", "background", "dog", "cat", "bird"]
    ))
    model = tiny_clip()
    import jax.numpy as jnp

    dummy = {
        "image": jnp.zeros((1, 32, 32, 3)),
        "input_ids": jnp.zeros((1, 12), jnp.int32),
        "attention_mask": jnp.ones((1, 12), jnp.int32),
    }
    params = model.init(jax.random.key(0), dummy)
    loader = build_seg_valid_loader(cfg, "pascal_voc")
    iou, miou = evaluate_benchmark(
        loader, model, params, cfg,
        tok, ["background", "dog", "cat", "bird"], top_cls_num=3,
        dataset_name="pascal_voc",
    )
    assert iou.shape == (4,)
    # random model: mIoU is defined (not nan) and in [0, 1]
    assert 0.0 <= miou <= 1.0

    # batched eval (variable GT sizes via pad-collate) gives identical totals
    cfg.set_immutable(False)
    cfg.data.batch_size_val = 2
    loader2 = build_seg_valid_loader(cfg, "pascal_voc")
    iou2, miou2 = evaluate_benchmark(
        loader2, model, params, cfg,
        tok, ["background", "dog", "cat", "bird"], top_cls_num=3,
        dataset_name="pascal_voc",
    )
    np.testing.assert_allclose(
        np.nan_to_num(iou), np.nan_to_num(iou2), rtol=1e-6
    )
    assert miou == pytest.approx(miou2, rel=1e-6)

    # ragged final batch is padded to the compiled shape (2 images, batch 4)
    cfg.set_immutable(False)
    cfg.data.batch_size_val = 4
    loader3 = build_seg_valid_loader(cfg, "pascal_voc")
    iou3, miou3 = evaluate_benchmark(
        loader3, model, params, cfg,
        tok, ["background", "dog", "cat", "bird"], top_cls_num=3,
        dataset_name="pascal_voc",
    )
    np.testing.assert_allclose(
        np.nan_to_num(iou), np.nan_to_num(iou3), rtol=1e-6
    )

    # multi-chip eval: batches sharded over the 8-way data mesh give the
    # same histograms (batch 8 = 2 real + 6 padded rows, 1 image/device)
    from simseg_tpu.parallel import make_mesh

    cfg.set_immutable(False)
    cfg.data.batch_size_val = 8
    loader4 = build_seg_valid_loader(cfg, "pascal_voc")
    iou4, miou4 = evaluate_benchmark(
        loader4, model, params, cfg,
        tok, ["background", "dog", "cat", "bird"], top_cls_num=3,
        dataset_name="pascal_voc", mesh=make_mesh(),
    )
    np.testing.assert_allclose(
        np.nan_to_num(iou), np.nan_to_num(iou4), rtol=1e-6
    )
    assert miou == pytest.approx(miou4, rel=1e-6)


def test_evaluate_benchmark_int8_static(voc_fixture):
    """Quantized-tower eval end to end: prepare_quant_params must calibrate
    on the first loader batch (image tower) and the prompt bank (text
    tower) before anything compiles, and the eval must complete."""
    cfg, _ = voc_fixture
    tok = WordPieceTokenizer(make_test_vocab(
        ["a", "photo", "of", "the", "background", "dog", "cat", "bird"]
    ))
    model = tiny_clip(image_arch=(("quant", "int8_static"),),
                      text_arch=(("quant", "int8_static"),))
    import jax.numpy as jnp

    dummy = {
        "image": jnp.zeros((1, 32, 32, 3)),
        "input_ids": jnp.zeros((1, 12), jnp.int32),
        "attention_mask": jnp.ones((1, 12), jnp.int32),
    }
    params = model.init(jax.random.key(0), dummy)
    loader = build_seg_valid_loader(cfg, "pascal_voc")
    iou, miou = evaluate_benchmark(
        loader, model, params, cfg,
        tok, ["background", "dog", "cat", "bird"], top_cls_num=3,
        dataset_name="pascal_voc",
    )
    assert iou.shape == (4,)
    assert 0.0 <= miou <= 1.0


def test_oversized_gt_label_raises_canvas(tmp_path):
    """A GT label larger than the dataset's declared canvas auto-raises the
    padded canvas at loader scan time (PNG headers) instead of crashing
    mid-eval."""
    root = tmp_path / "VOCdevkit" / "VOC2012"
    (root / "JPEGImages").mkdir(parents=True)
    (root / "SegmentationClass").mkdir()
    (root / "ImageSets" / "Segmentation").mkdir(parents=True)
    rng = np.random.default_rng(0)
    names = []
    # second label exceeds the 512px pascal_voc canvas
    for i, (h, w) in enumerate([(45, 55), (40, 600)]):
        n = f"2007_{i:06d}"
        names.append(n)
        Image.fromarray(rng.integers(0, 255, (h, w, 3), np.uint8)).save(
            root / "JPEGImages" / f"{n}.jpg"
        )
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
    ], target=new_base_cfg())

    tok = WordPieceTokenizer(make_test_vocab(
        ["a", "photo", "of", "the", "background", "dog", "cat", "bird"]
    ))
    model = tiny_clip()
    import jax.numpy as jnp

    dummy = {
        "image": jnp.zeros((1, 32, 32, 3)),
        "input_ids": jnp.zeros((1, 12), jnp.int32),
        "attention_mask": jnp.ones((1, 12), jnp.int32),
    }
    params = model.init(jax.random.key(0), dummy)
    loader = build_seg_valid_loader(cfg, "pascal_voc")
    assert loader.dataset.max_label_size() == (45, 600)
    iou, miou = evaluate_benchmark(
        loader, model, params, cfg,
        tok, ["background", "dog", "cat", "bird"], top_cls_num=3,
        dataset_name="pascal_voc",
    )
    assert iou.shape == (4,)
    assert 0.0 <= miou <= 1.0


def test_label_banks_present():
    for name, expect in [("pascal_voc", 21), ("pascal_context", 60),
                         ("coco_stuff", 81)]:
        bank = load_label_bank(name, data_root="data")
        assert bank[0] == "background"
        # reference label files: VOC 21 (bg+20), context 60, coco 81 per
        # SURVEY §2.7 (file line counts differ by trailing newline handling)
        assert len(bank) in (expect, expect - 1), (name, len(bank))
