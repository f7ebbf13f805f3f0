"""Linear-probe task through the real CLI surface (launch.py ->
tasks/linear_prob/train.py) on a toy ImageFolder, with the task's default
LARS optimizer. Complements tests/test_train_cli.py (clip task)."""

import os
import subprocess
import sys

import numpy as np
import pytest
from PIL import Image

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

LINEAR_YAML = """\
epoch: 2
seed: 0
dist:
  bf16: False
log:
  interval_train: 1
ckpt:
  step_interval: -1
model:
  image_encoder:
    tag: vit_test
  classifier:
    num_classes: 2
transforms:
  input_size: 32
  resize:
    size: 32
  train_transforms: [resize]
  valid_transforms: [resize]
optim:
  lr:
    init: 0.1
data:
  exp_name: toylinear
  batch_size: 8
  batch_size_val: 8
  num_workers: 1
"""


def test_launch_linear_prob_training(tmp_path):
    rng = np.random.default_rng(0)
    for split, n in [("train", 16), ("val", 8)]:
        for cls in range(2):
            d = tmp_path / "data" / split / f"class_{cls}"
            d.mkdir(parents=True)
            for i in range(n // 2):
                arr = rng.integers(0, 255, (40, 40, 3), np.uint8)
                Image.fromarray(arr).save(d / f"{i}.jpg")
    (tmp_path / "toy.yaml").write_text(LINEAR_YAML)

    env = dict(os.environ)
    env.update(JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=8",
               PYTHONPATH=REPO)
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "launch.py"),
         "--task", "linear_prob", "--cfg", str(tmp_path / "toy.yaml"),
         f"data.data_path={tmp_path}/data/",
         f"ckpt.dir={tmp_path}/out"],
        cwd=str(tmp_path), env=env, capture_output=True, text=True,
        timeout=600,
    )
    out = proc.stdout + proc.stderr
    assert proc.returncode == 0, out[-3000:]
    # 16 train images / batch 8 = 2 steps/epoch, 2 epochs
    assert "Epoch [1/2][2/2]" in out, out[-3000:]
    assert "Epoch [2/2][2/2]" in out, out[-3000:]
    # the LinearEvalHook ran and reported accuracies
    assert "[linear eval] top-1:" in out, out[-3000:]
    # per-epoch checkpoints were written
    assert (tmp_path / "out" / "toylinear" / "epoch_002").exists()
