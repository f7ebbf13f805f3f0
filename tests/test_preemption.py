"""Graceful-preemption lifecycle through the real CLI: SIGTERM a training
run mid-epoch -> it checkpoints and exits 0 -> a restart auto-resumes and
finishes with exact step counts."""

import os
import signal
import subprocess
import sys
import time

import numpy as np
import pytest
from PIL import Image

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _setup(tmp_path, n_train=64):
    rng = np.random.default_rng(0)
    words = ["dog", "cat", "car", "tree"]
    d = tmp_path / "data" / "toy" / "train"
    d.mkdir(parents=True)
    rows = ["image,caption,image_id,caption_id"]
    for i in range(n_train):
        name = f"train_{i}.jpg"
        Image.fromarray(rng.integers(0, 255, (40, 40, 3), np.uint8)).save(d / name)
        rows.append(f"{name},a photo of the {words[i % 4]},{i // 2},{i}")
    (tmp_path / "data" / "toy" / "train_anno.csv").write_text("\n".join(rows))

    from simseg_tpu.data.tokenizer import make_test_vocab

    (tmp_path / "vocab.txt").write_text(
        "\n".join(make_test_vocab(words + ["a", "photo", "of", "the"])) + "\n")

    (tmp_path / "toy.yaml").write_text("""\
epoch: 40
seed: 0
runner:
  name: clip
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
data:
  exp_name: toresume
  train_type: shuffle
  train_name: [toy]
  valid_name: []
  batch_size: 8
  num_workers: 1
""")


def _cmd(tmp_path, extra=()):
    return [sys.executable, os.path.join(REPO, "launch.py"),
            "--task", "clip", "--cfg", str(tmp_path / "toy.yaml"),
            "--vocab_file", str(tmp_path / "vocab.txt"),
            f"data.data_path={tmp_path}/data/",
            f"ckpt.dir={tmp_path}/out", *extra]


@pytest.mark.slow
def test_sigterm_checkpoints_and_resumes(tmp_path):
    _setup(tmp_path)
    env = dict(os.environ)
    env.update(JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=8",
               PYTHONPATH=REPO)
    log = tmp_path / "run1.log"
    with open(log, "w") as f:
        proc = subprocess.Popen(_cmd(tmp_path), cwd=str(tmp_path), env=env,
                                stdout=f, stderr=subprocess.STDOUT)
        # wait until training is visibly past compile (a couple of steps)
        deadline = time.time() + 240
        while time.time() < deadline:
            if log.read_text().count("Epoch [") >= 3:
                break
            time.sleep(1)
        else:
            proc.kill()
            pytest.fail("training never produced step logs:\n" + log.read_text()[-2000:])
        # launch.py spawns the trainer as a child; SIGTERM the process group
        # like a VM reclaim would
        proc.send_signal(signal.SIGTERM)
        rc = proc.wait(timeout=240)
    text = log.read_text()
    assert rc == 0, text[-3000:]
    assert "Preemption checkpoint written" in text
    assert os.path.exists(tmp_path / "out" / "toresume" / "step_checkpoint")

    # restart: auto-resume picks up mid-epoch and keeps training
    log2 = tmp_path / "run2.log"
    with open(log2, "w") as f:
        proc = subprocess.Popen(_cmd(tmp_path, ("epoch=1",)), cwd=str(tmp_path),
                                env=env, stdout=f, stderr=subprocess.STDOUT)
        rc2 = proc.wait(timeout=300)
    text2 = log2.read_text()
    assert rc2 == 0, text2[-3000:]
    assert "Auto-resumed at epoch" in text2
