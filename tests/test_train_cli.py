"""Training entry points exercised through the real CLI surface
(launch.py -> tasks/*/train.py) on toy data."""

import os
import subprocess
import sys

import numpy as np
import pytest
from PIL import Image

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CLIP_YAML = """\
epoch: 1
seed: 0
runner:
  name: clip
  stable_random: step
dist:
  bf16: False
log:
  interval_train: 1
ckpt:
  step_interval: -1
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
optim:
  lr:
    name: constant_schedule
    init: 1.0e-3
transforms:
  input_size: 32
  resize:
    size: 32
  train_transforms: [resize]
  valid_transforms: [resize]
data:
  exp_name: toytrain
  train_type: shuffle
  train_name: [toy]
  valid_name: [toy]
  batch_size: 8
  batch_size_val: 8
  num_workers: 1
"""


def _make_clip_data(root):
    rng = np.random.default_rng(0)
    words = ["dog", "cat", "car", "tree"]
    for split, n in [("train", 16), ("valid", 8)]:
        d = root / "toy" / split
        d.mkdir(parents=True)
        rows = ["image,caption,image_id,caption_id"]
        for i in range(n):
            name = f"{split}_{i}.jpg"
            Image.fromarray(rng.integers(0, 255, (40, 40, 3), np.uint8)).save(d / name)
            rows.append(f"{name},a photo of the {words[i % 4]},{i // 2},{i}")
        (root / "toy" / f"{split}_anno.csv").write_text("\n".join(rows))


def _write_vocab(path):
    from simseg_tpu.data.tokenizer import make_test_vocab

    vocab = make_test_vocab(["a", "photo", "of", "the",
                             "dog", "cat", "car", "tree"])
    with open(path, "w") as f:
        for tok in vocab:
            f.write(tok + "\n")


@pytest.mark.slow
def test_launch_clip_training(tmp_path):
    data = tmp_path / "data"
    data.mkdir()
    _make_clip_data(data)
    cfg_path = tmp_path / "toy.yaml"
    cfg_path.write_text(CLIP_YAML)
    vocab = tmp_path / "vocab.txt"
    _write_vocab(vocab)

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    env["PYTHONPATH"] = REPO
    result = subprocess.run(
        [sys.executable, os.path.join(REPO, "launch.py"),
         "--task", "clip", "--cfg", str(cfg_path),
         "--vocab_file", str(vocab),
         f"data.data_path={data}/",
         f"ckpt.dir={tmp_path}/out"],
        cwd=str(tmp_path), env=env, capture_output=True, text=True, timeout=900,
    )
    assert result.returncode == 0, result.stdout[-3000:] + result.stderr[-3000:]
    assert "rsum" in result.stdout
    # epoch checkpoint written under ckpt.dir/exp_name
    assert os.path.isdir(tmp_path / "out" / "toytrain" / "epoch_001")
    # launcher teed the log
    assert os.path.exists(tmp_path / "output" / "toy_log.txt")


@pytest.mark.slow
def test_launch_clip_training_pipeline_parallel(tmp_path):
    """dist.pp_size=2 through the real CLI: mesh ('pipe', 'data'), image
    tower pipelined (parallel/pp.py), full train + val epoch."""
    data = tmp_path / "data"
    data.mkdir()
    _make_clip_data(data)
    cfg_path = tmp_path / "toy.yaml"
    cfg_path.write_text(CLIP_YAML)
    vocab = tmp_path / "vocab.txt"
    _write_vocab(vocab)

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    env["PYTHONPATH"] = REPO
    result = subprocess.run(
        [sys.executable, os.path.join(REPO, "launch.py"),
         "--task", "clip", "--cfg", str(cfg_path),
         "--vocab_file", str(vocab),
         f"data.data_path={data}/",
         f"ckpt.dir={tmp_path}/out",
         "dist.pp_size=2", "dist.pp_micro=2"],
        cwd=str(tmp_path), env=env, capture_output=True, text=True, timeout=900,
    )
    assert result.returncode == 0, result.stdout[-3000:] + result.stderr[-3000:]
    assert "'pipe': 2" in result.stdout or "pipe" in result.stdout
    assert "rsum" in result.stdout


@pytest.mark.slow
def test_train_export_serve_roundtrip(tmp_path):
    """The full production loop: train via launch.py -> native epoch
    checkpoint -> tools/export_serving.py (native-ckpt branch) -> call the
    deserialized artifact with raw uint8 — no model code on the 'server'."""
    data = tmp_path / "data"
    data.mkdir()
    _make_clip_data(data)
    cfg_path = tmp_path / "toy.yaml"
    cfg_path.write_text(CLIP_YAML)
    vocab = tmp_path / "vocab.txt"
    _write_vocab(vocab)
    (tmp_path / "data" / "label_category").mkdir()
    (tmp_path / "data" / "label_category" / "pascal_voc.txt").write_text(
        "background\ndog\ncat\ncar\n")

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    env["PYTHONPATH"] = REPO

    train = subprocess.run(
        [sys.executable, os.path.join(REPO, "launch.py"),
         "--task", "clip", "--cfg", str(cfg_path),
         "--vocab_file", str(vocab),
         f"data.data_path={data}/",
         f"ckpt.dir={tmp_path}/out"],
        cwd=str(tmp_path), env=env, capture_output=True, text=True, timeout=900,
    )
    assert train.returncode == 0, train.stdout[-3000:] + train.stderr[-3000:]
    ckpt_dir = tmp_path / "out" / "toytrain"
    assert (ckpt_dir / "latest_ckpt").exists()

    export = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "export_serving.py"),
         "--cfg", str(cfg_path), "--vocab_file", str(vocab),
         "--ckpt_path", str(ckpt_dir), "--kind", "seg",
         "--dataset", "pascal_voc", "--batch", "2",
         "--out", str(tmp_path / "trained.shlo")],
        cwd=str(tmp_path), env=env, capture_output=True, text=True, timeout=600,
    )
    assert export.returncode == 0, export.stdout[-3000:] + export.stderr[-3000:]
    assert "randomly initialized" not in export.stdout

    from simseg_tpu import serving

    fn = serving.load_artifact(str(tmp_path / "trained.shlo"))
    rng = np.random.default_rng(0)
    raw = rng.integers(0, 255, (2, 32, 32, 3)).astype(np.uint8)
    pred, conf = fn(raw)
    assert pred.shape == (2, 32, 32) and conf.shape == (2, 32, 32)
    assert np.isfinite(np.asarray(conf)).all()
