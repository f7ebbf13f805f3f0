"""Multi-scale dense inference in the seg eval forward."""

import copy

import jax
import jax.numpy as jnp
import numpy as np

from simseg_tpu.config import new_base_cfg, update_cfg
from simseg_tpu.tasks.clip.config import task_cfg_init_fn
from simseg_tpu.tasks.seg_eval import make_seg_forward
from tests.test_models import tiny_clip


def _cfg(scales):
    cfg = update_cfg(task_cfg_init_fn, None, argv=[
        "model.max_length=12",
        "transforms.input_size=32",
        f"seg_eval.scales={scales}",
    ], target=new_base_cfg())
    return cfg


def _inputs(seed=0, b=2, canvas=64):
    rng = np.random.default_rng(seed)
    images = rng.integers(0, 255, (b, 32, 32, 3)).astype(np.uint8)
    tb = rng.normal(size=(6, 16)).astype(np.float32)
    tb /= np.linalg.norm(tb, axis=1, keepdims=True)
    labels = np.full((b, canvas, canvas), 255, np.int32)
    labels[:, :40, :48] = rng.integers(0, 6, (b, 40, 48))
    return (jnp.asarray(images), jnp.asarray(tb), jnp.asarray(labels),
            jnp.asarray([40, 40]), jnp.asarray([48, 48]))


def _run(scales):
    cfg = _cfg(scales)
    model = tiny_clip()
    dummy = {
        "image": jnp.zeros((1, 32, 32, 3)),
        "input_ids": jnp.zeros((1, 12), jnp.int32),
        "attention_mask": jnp.ones((1, 12), jnp.int32),
    }
    params = model.init(jax.random.key(0), dummy)
    fwd = make_seg_forward(model, cfg, num_classes=6, top_cls_num=4,
                           canvas=64, patch_size=8)
    images, tb, labels, h, w = _inputs()
    inter, union = fwd(params, images, tb, labels, h, w)
    return np.asarray(inter), np.asarray(union)


def test_single_scale_default_unchanged():
    i1, u1 = _run("[1.0]")
    assert i1.shape == (6,) and np.all(u1 >= i1)


def test_multi_scale_runs():
    i2, u2 = _run("[1.0,0.75,1.25]")
    assert i2.shape == (6,)
    assert np.all(np.isfinite(i2)) and np.all(u2 >= i2)


def test_sliding_window_runs():
    cfg = update_cfg(task_cfg_init_fn, None, argv=[
        "model.max_length=12",
        "transforms.input_size=32",
        "seg_eval.window={'size': 16, 'stride': 8}",
    ], target=new_base_cfg())
    model = tiny_clip(img_size=16)  # windows are 16px -> 2x2 patch grid
    dummy = {
        "image": jnp.zeros((1, 16, 16, 3)),
        "input_ids": jnp.zeros((1, 12), jnp.int32),
        "attention_mask": jnp.ones((1, 12), jnp.int32),
    }
    params = model.init(jax.random.key(0), dummy)
    fwd = make_seg_forward(model, cfg, num_classes=6, top_cls_num=4,
                           canvas=64, patch_size=8)
    images, tb, labels, h, w = _inputs()
    inter, union = fwd(params, images, tb, labels, h, w)
    assert inter.shape == (6,)
    assert np.all(np.isfinite(np.asarray(inter)))
    assert np.all(np.asarray(union) >= np.asarray(inter))


def test_vit_variable_resolution_pos_embed():
    """The ViT resamples its position grid for off-nominal input sizes
    (multi-scale path)."""
    from simseg_tpu.models import build_vit

    model = build_vit("vit_test", img_size=32)
    params = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
    out24 = model.apply(params, jnp.ones((2, 24, 24, 3)))
    assert out24.shape == (2, 1 + 9, 32)
    out48 = model.apply(params, jnp.ones((2, 48, 48, 3)))
    assert out48.shape == (2, 1 + 36, 32)
    assert np.all(np.isfinite(np.asarray(out24)))


def test_multi_scale_with_token_merging():
    """The full fused eval forward composes with tome_r (ops/tome.py): the
    tower unmerges before the decode, so every scale's dense map keeps the
    per-patch layout the decode expects."""
    cfg = _cfg("[1.0,0.75,1.25]")
    model = tiny_clip(image_arch=(("tome_r", 2),))
    dummy = {
        "image": jnp.zeros((1, 32, 32, 3)),
        "input_ids": jnp.zeros((1, 12), jnp.int32),
        "attention_mask": jnp.ones((1, 12), jnp.int32),
    }
    params = model.init(jax.random.key(0), dummy)
    fwd = make_seg_forward(model, cfg, num_classes=6, top_cls_num=4,
                           canvas=64, patch_size=8)
    images, tb, labels, h, w = _inputs()
    inter, union = fwd(params, images, tb, labels, h, w)
    assert inter.shape == (6,)
    assert np.all(np.isfinite(np.asarray(inter)))
    assert np.all(np.asarray(union) >= np.asarray(inter))
