"""Linear-probe pipeline and runner."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from simseg_tpu.config import new_base_cfg, update_cfg
from simseg_tpu.core.runner import LinearProbRunner
from simseg_tpu.models.linear_prob import LinearProbModel, linear_prob_loss_fn
from simseg_tpu.tasks.linear_prob.config import task_cfg_init_fn


def tiny_linear(num_classes=4, trainable=False):
    return LinearProbModel(
        image_tag="vit_test", img_size=32, num_classes=num_classes,
        only_cls_token=True, encoder_trainable=trainable,
    )


def _batch(n=8, num_classes=4, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "image": jnp.asarray(rng.normal(size=(n, 32, 32, 3)).astype(np.float32)),
        "label": jnp.asarray(rng.integers(0, num_classes, n)),
    }


def test_frozen_encoder_gets_zero_grads():
    model = tiny_linear(trainable=False)
    batch = _batch()
    params = model.init(jax.random.key(0), batch)
    grads = jax.grad(lambda p: linear_prob_loss_fn(model, p, batch)[0])(params)
    enc = jax.tree.leaves(grads["params"]["image_encoder"])
    assert all(np.allclose(np.asarray(g), 0.0) for g in enc)
    cls = np.asarray(grads["params"]["classifier"]["kernel"])
    assert np.abs(cls).max() > 0


def test_trainable_encoder_gets_grads():
    model = tiny_linear(trainable=True)
    batch = _batch()
    params = model.init(jax.random.key(0), batch)
    grads = jax.grad(lambda p: linear_prob_loss_fn(model, p, batch)[0])(params)
    enc = jax.tree.leaves(grads["params"]["image_encoder"])
    assert any(np.abs(np.asarray(g)).max() > 0 for g in enc)


def test_loss_and_accuracy_metrics():
    model = tiny_linear()
    batch = _batch()
    params = model.init(jax.random.key(0), batch)
    loss, metrics = linear_prob_loss_fn(model, params, batch)
    assert np.isfinite(float(loss))
    assert 0 <= float(metrics["acc1"]) <= float(metrics["acc5"]) <= 1


def test_linear_prob_runner(tmp_path):
    rng = np.random.default_rng(0)
    for split, n in [("train", 16), ("val", 8)]:
        for cls in range(2):
            d = tmp_path / split / f"class_{cls}"
            d.mkdir(parents=True)
            for i in range(n // 2):
                arr = rng.integers(0, 255, (40, 40, 3), np.uint8)
                Image.fromarray(arr).save(d / f"{i}.jpg")

    cfg = update_cfg(task_cfg_init_fn, None, argv=[
        "epoch=2",
        "seed=0",
        "dist.bf16=false",
        f"data.data_path={tmp_path}/",
        "data.batch_size=8",
        "data.batch_size_val=8",
        "data.num_workers=1",
        f"ckpt.dir={tmp_path}/out",
        "ckpt.step_interval=-1",
        "log.interval_train=1",
        "model.classifier.num_classes=2",
        "transforms.input_size=32",
        "transforms.resize.size=32",
        "transforms.train_transforms=[resize]",
        "transforms.valid_transforms=[resize]",
        "optim.name=torch.optim.SGD",
        "optim.param={'momentum': 0.9}",
        "optim.lr.name=constant_schedule",
        "optim.lr.init=0.01",
    ], target=new_base_cfg())

    from simseg_tpu.data.datasets import build_imagenet_dataloaders

    loaders = build_imagenet_dataloaders(cfg)
    runner = LinearProbRunner(cfg, tiny_linear(num_classes=2), loaders)
    runner.run()
    assert runner.epoch == 2
    assert "acc1" in runner.state.linear_eval


def test_soft_target_mixup_identity():
    """Mixup's soft-target CE decomposes exactly: CE against
    lam*onehot(y) + (1-lam)*onehot(flip(y)) == lam*CE(y) + (1-lam)*CE(flip)
    (linearity of soft_target_ce in the target argument)."""
    from simseg_tpu.ops.losses import label_smoothing_ce, soft_target_ce

    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(size=(6, 4)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, 4, 6))
    lam = 0.3
    soft = lam * jax.nn.one_hot(y, 4) + (1 - lam) * jax.nn.one_hot(
        jnp.flip(y, 0), 4)
    got = soft_target_ce(logits, soft)
    want = lam * label_smoothing_ce(logits, y, 0.0) + (
        1 - lam) * label_smoothing_ce(logits, jnp.flip(y, 0), 0.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5)


def test_linear_prob_runner_mixup(tmp_path):
    """cfg.mixup.enable drives a live mixup path (Beta-blended batch +
    soft targets) — the key is no longer declarative-only."""
    rng = np.random.default_rng(1)
    for split, n in [("train", 16), ("val", 8)]:
        for cls in range(2):
            d = tmp_path / split / f"class_{cls}"
            d.mkdir(parents=True)
            for i in range(n // 2):
                arr = rng.integers(0, 255, (40, 40, 3), np.uint8)
                Image.fromarray(arr).save(d / f"{i}.jpg")

    cfg = update_cfg(task_cfg_init_fn, None, argv=[
        "epoch=1",
        "seed=0",
        "dist.bf16=false",
        f"data.data_path={tmp_path}/",
        "data.batch_size=8",
        "data.batch_size_val=8",
        "data.num_workers=1",
        f"ckpt.dir={tmp_path}/out",
        "ckpt.step_interval=-1",
        "log.interval_train=1",
        "mixup.enable=True",
        "mixup.alpha=0.4",
        "model.classifier.num_classes=2",
        "transforms.input_size=32",
        "transforms.resize.size=32",
        "transforms.train_transforms=[resize]",
        "transforms.valid_transforms=[resize]",
        "optim.name=torch.optim.SGD",
        "optim.param={'momentum': 0.9}",
        "optim.lr.name=constant_schedule",
        "optim.lr.init=0.01",
    ], target=new_base_cfg())

    from simseg_tpu.data.datasets import build_imagenet_dataloaders

    loaders = build_imagenet_dataloaders(cfg)
    runner = LinearProbRunner(cfg, tiny_linear(num_classes=2), loaders)
    runner.run()
    assert runner.epoch == 1
    assert "acc1" in runner.state.linear_eval
