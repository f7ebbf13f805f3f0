"""CLI smoke tests: the public tools run end-to-end via their real argv
surface (config yaml + dotted overrides + vocab fallback)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest
from PIL import Image

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TINY_YAML = """\
model:
  image_encoder:
    tag: vit_test
    embedding_dim: 32
  text_encoder:
    tag: bert_test
    embedding_dim: 32
  projection:
    name: simple
    dim: 16
  pool:
    name: loda
    loda:
      image_k: 3
      text_k: 1
  max_length: 12
loss:
  temperature:
    name: parameter
    value: 0.02
dist:
  bf16: False
transforms:
  input_size: 32
  resize:
    size: 32
  valid_transforms: [resize]
data:
  batch_size_val: 1
  num_workers: 1
"""


def _write_vocab(path):
    from simseg_tpu.data.tokenizer import make_test_vocab

    vocab = make_test_vocab(["a", "photo", "of", "the", "background",
                             "dog", "cat", "bird"])
    with open(path, "w") as f:
        for tok in vocab:
            f.write(tok + "\n")


def _run(args, cwd):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # 8 virtual devices so the tools' multi-chip mesh path (eval_mesh
    # sharding or its divisibility fallback) is exercised end-to-end
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    env["PYTHONPATH"] = REPO
    return subprocess.run(
        [sys.executable] + args, cwd=cwd, env=env,
        capture_output=True, text=True, timeout=600,
    )


@pytest.mark.slow
def test_seg_evaluation_cli(tmp_path):
    # fixture VOC data
    root = tmp_path / "data" / "VOCdevkit" / "VOC2012"
    (root / "JPEGImages").mkdir(parents=True)
    (root / "SegmentationClass").mkdir()
    (root / "ImageSets" / "Segmentation").mkdir(parents=True)
    rng = np.random.default_rng(0)
    names = []
    for i in range(2):
        n = f"2007_{i:06d}"
        names.append(n)
        Image.fromarray(rng.integers(0, 255, (40, 50, 3), np.uint8)).save(
            root / "JPEGImages" / f"{n}.jpg")
        Image.fromarray(rng.integers(0, 4, (40, 50)).astype(np.uint8)).save(
            root / "SegmentationClass" / f"{n}.png")
    (root / "ImageSets" / "Segmentation" / "val.txt").write_text("\n".join(names))

    # label bank with the tiny 4-class set
    (tmp_path / "data" / "label_category").mkdir()
    (tmp_path / "data" / "label_category" / "pascal_voc.txt").write_text(
        "background\ndog\ncat\nbird\n")

    cfg_path = tmp_path / "tiny.yaml"
    cfg_path.write_text(TINY_YAML)
    vocab = tmp_path / "vocab.txt"
    _write_vocab(vocab)

    result = _run(
        [os.path.join(REPO, "tools", "seg_evaluation.py"),
         "--cfg", str(cfg_path), "--vocab_file", str(vocab),
         "data.valid_name=[pascal_voc]", f"data.data_path={tmp_path}/data/"],
        cwd=str(tmp_path),
    )
    assert result.returncode == 0, result.stdout + result.stderr
    assert "final mean iou" in result.stdout


@pytest.mark.slow
def test_export_serving_cli(tmp_path):
    (tmp_path / "data" / "label_category").mkdir(parents=True)
    (tmp_path / "data" / "label_category" / "pascal_voc.txt").write_text(
        "background\ndog\ncat\nbird\n")
    cfg_path = tmp_path / "tiny.yaml"
    cfg_path.write_text(TINY_YAML)
    vocab = tmp_path / "vocab.txt"
    _write_vocab(vocab)

    result = _run(
        [os.path.join(REPO, "tools", "export_serving.py"),
         "--cfg", str(cfg_path), "--vocab_file", str(vocab),
         "--kind", "seg", "--dataset", "pascal_voc", "--batch", "2",
         "--out", str(tmp_path / "seg.shlo")],
        cwd=str(tmp_path),
    )
    assert result.returncode == 0, result.stdout + result.stderr
    assert (tmp_path / "seg.shlo").stat().st_size > 0

    # the artifact is callable without any model/config machinery
    from simseg_tpu import serving

    fn = serving.load_artifact(str(tmp_path / "seg.shlo"))
    pred, conf = fn(np.zeros((2, 32, 32, 3), np.uint8))
    assert pred.shape == (2, 32, 32) and conf.shape == (2, 32, 32)


@pytest.mark.slow
def test_retrieval_evaluation_cli(tmp_path):
    import pandas as pd
    from io import BytesIO

    rng = np.random.default_rng(1)
    rows = []
    for i in range(6):
        buf = BytesIO()
        Image.fromarray(rng.integers(0, 255, (40, 40, 3), np.uint8)).save(
            buf, "JPEG")
        rows.append({
            "imbytes": buf.getvalue(),
            "caption": f"a photo of the dog {i}",
            "image_id": i // 2,
            "id": i,
        })
    (tmp_path / "data" / "f30k").mkdir(parents=True)
    pd.DataFrame(rows).to_parquet(tmp_path / "data" / "f30k" / "valid.parquet")

    cfg_path = tmp_path / "tiny.yaml"
    cfg_path.write_text(TINY_YAML)
    vocab = tmp_path / "vocab.txt"
    _write_vocab(vocab)

    result = _run(
        [os.path.join(REPO, "tools", "retrieval_evaluation.py"),
         "--cfg", str(cfg_path), "--vocab_file", str(vocab),
         "data.valid_name=[f30k]", f"data.data_path={tmp_path}/data/",
         "data.batch_size_val=3"],
        cwd=str(tmp_path),
    )
    assert result.returncode == 0, result.stdout + result.stderr
    assert "rsum" in result.stdout


def test_retrieval_eval_sharded_matches_single(tmp_path):
    """Multi-chip retrieval eval: batches sharded over the 8-way mesh (with
    ragged-final-batch padding) produce the same summary as single-device."""
    import sys as _sys
    from io import BytesIO

    import pandas as pd

    _sys.path.insert(0, os.path.join(REPO, "tools"))
    import retrieval_evaluation as rtool

    from simseg_tpu.config import new_base_cfg, update_cfg
    from simseg_tpu.data.datasets import DataLoader, ParquetRetrievalDataset
    from simseg_tpu.data.tokenizer import WordPieceTokenizer, make_test_vocab
    from simseg_tpu.data.transforms import build_transforms
    from simseg_tpu.parallel import make_mesh
    from simseg_tpu.tasks.clip.config import task_cfg_init_fn
    from tests.test_models import tiny_clip

    rng = np.random.default_rng(5)
    rows = []
    for i in range(10):  # 10 rows: batch 8 -> one full + one ragged batch
        buf = BytesIO()
        Image.fromarray(rng.integers(0, 255, (40, 40, 3), np.uint8)).save(
            buf, "JPEG")
        rows.append({"imbytes": buf.getvalue(),
                     "caption": f"a photo of the dog {i}",
                     "image_id": i // 2, "id": i})
    (tmp_path / "f30k").mkdir()
    pd.DataFrame(rows).to_parquet(tmp_path / "f30k" / "valid.parquet")

    cfg = update_cfg(task_cfg_init_fn, None, argv=[
        f"data.data_path={tmp_path}/",
        "data.batch_size_val=8",
        "data.num_workers=1",
        "model.max_length=12",
        "transforms.input_size=32",
        "transforms.resize.size=32",
        "transforms.valid_transforms=[resize]",
    ], target=new_base_cfg())
    tok = WordPieceTokenizer(make_test_vocab(
        ["a", "photo", "of", "the", "dog"]))
    model = tiny_clip()
    import jax
    import jax.numpy as jnp

    dummy = {"image": jnp.zeros((1, 32, 32, 3)),
             "input_ids": jnp.zeros((1, 12), jnp.int32),
             "attention_mask": jnp.ones((1, 12), jnp.int32)}
    params = model.init(jax.random.key(0), dummy)
    tf = build_transforms(cfg, "valid")

    def run(mesh):
        ds = ParquetRetrievalDataset(cfg, "f30k", tok, tf)
        loader = DataLoader(ds, cfg.data.batch_size_val, num_workers=1)
        return rtool.evaluate_benchmark(loader, model, params, cfg, mesh=mesh)

    single = run(None)
    sharded = run(make_mesh())
    for k in single:
        assert single[k] == pytest.approx(sharded[k], rel=1e-5), k
