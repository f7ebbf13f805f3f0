"""ConvNeXt / EfficientNet CNN families: flax modules vs timm-layout torch
fixtures with bridged weights, tag resolution, and export round-trips.

Parity: reference ``simseg/models/backbones/mml/timm_builder.py:7-20``
(any timm tag); these families extend the CNN surface beyond ResNet."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from simseg_tpu.checkpoint.torch_bridge import clip_mapping_table, torch_to_flax
from simseg_tpu.models.cnn import build_cnn
from simseg_tpu.models.convnext import build_convnext
from simseg_tpu.models.efficientnet import (
    build_efficientnet,
    round_channels,
    scaled_stages,
)
from tests.torch_reference import TorchTinyConvNeXt, TorchTinyEfficientNet


def _bridge_bare_encoder(tmodel, fmodel, init_shape):
    """Bridge a torch backbone's state dict into a bare flax encoder (the
    clip table scoped to the image tower, image_encoder level dropped)."""
    variables = fmodel.init(jax.random.key(0), jnp.zeros(init_shape))
    state = {
        "image_encoder.model.model." + k: v.detach().numpy()
        for k, v in tmodel.state_dict().items()
        if "num_batches_tracked" not in k
    }

    def strip(path):
        return (path[0],) + path[2:]

    table = [(pat, (lambda m, f=fn: strip(f(m))), cv)
             for pat, fn, cv in clip_mapping_table()]
    new_vars, report = torch_to_flax(state, variables, table)
    assert not report["missing"], report["missing"][:5]
    assert not report["mismatched"], report["mismatched"][:5]
    return new_vars


def _perturb(tmodel):
    torch.manual_seed(0)
    with torch.no_grad():
        for p in tmodel.parameters():
            if p.ndim > 0:
                p.add_(torch.randn_like(p) * 0.05)
        for m in tmodel.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.add_(torch.randn_like(m.running_mean) * 0.1)
                m.running_var.mul_(1.5)
    tmodel.eval()
    return tmodel


def test_convnext_forward_matches_torch():
    tmodel = _perturb(TorchTinyConvNeXt())
    fmodel = build_convnext("convnext_test")
    variables = _bridge_bare_encoder(tmodel, fmodel, (1, 32, 32, 3))

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        want = tmodel(torch.tensor(x)).numpy()  # (B, C, h, w)
    got = fmodel.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)))
    got = np.asarray(got).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_efficientnet_forward_matches_torch():
    tmodel = _perturb(TorchTinyEfficientNet())
    fmodel = build_efficientnet("efficientnet_test")
    variables = _bridge_bare_encoder(tmodel, fmodel, (1, 32, 32, 3))

    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        want = tmodel(torch.tensor(x)).numpy()
    got = fmodel.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)))
    got = np.asarray(got).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_family_tags_resolve():
    m = build_cnn("convnext_tiny")
    assert m.depths == (3, 3, 9, 3) and m.dims == (96, 192, 384, 768)
    m = build_cnn("convnext_base_in22k")  # 0.6.x suffixed tag
    assert m.dims == (128, 256, 512, 1024)
    m = build_cnn("efficientnet_b0")
    assert m.stem_chs == 32 and m.head_chs == 1280
    assert m.stages[1] == (6, 24, 2, 2, 3)
    m = build_cnn("efficientnet_b2")  # width 1.1, depth 1.2
    assert m.stem_chs == 32 and m.head_chs == 1408
    assert m.stages[2][1] == 48 and m.stages[2][2] == 3
    m = build_cnn("resnet50")
    assert m.layers == (3, 4, 6, 3)
    # arch-declared shapes pick the family from their shape keys
    m = build_cnn("my_net", arch=dict(depths=[1], dims=[8]))
    assert m.dims == (8,)
    with pytest.raises(KeyError, match="convnext"):
        build_cnn("regnetx_002")  # unsupported family refuses loudly


def test_efficientnet_scaling_rules():
    # round_channels: timm's multiple-of-8 with the 10% guard
    assert round_channels(32 * 1.1) == 32  # 35.2 -> 32 (b2 keeps stem 32)
    assert round_channels(40 * 1.1) == 48  # 44 -> 48
    assert round_channels(1280 * 1.1) == 1408
    assert round_channels(16 * 1.1) == 16  # 17.6 -> 16 (>= 0.9 * 17.6)
    # b1: depth 1.1 -> stage repeats (1,2,2,3,3,4,1) -> ceil(*1.1)
    st = scaled_stages(1.0, 1.1)
    assert [s[2] for s in st] == [2, 3, 3, 4, 4, 5, 2]


def test_clip_pipeline_with_convnext_tower():
    from simseg_tpu.models.clip import CLIPModel

    model = CLIPModel(
        image_tag="convnext_test", img_size=32, text_tag="bert_test",
        projection_name="simple", projection_dim=16, pool_name="avg",
        image_k=3, text_k=1, temperature_name="constant",
        temperature_init=0.02,
    )
    rng = np.random.default_rng(2)
    batch = {
        "image": jnp.asarray(rng.normal(size=(2, 64, 64, 3)).astype(np.float32)),
        "input_ids": jnp.asarray(rng.integers(0, 128, (2, 8))),
        "attention_mask": jnp.ones((2, 8), jnp.int32),
    }
    variables = model.init(jax.random.key(0), batch)
    img, txt, temp = model.apply(variables, batch)
    assert img.shape == (2, 16) and txt.shape == (2, 16)
    feats = model.apply(variables, batch, embeddings="image")
    # stem /4 then one /2 downsample: 64 -> 8x8 = 64 tokens of 16 ch
    assert feats.shape == (2, 64, 16)


def test_clip_pipeline_with_efficientnet_tower_and_bn_training():
    from simseg_tpu.engine.train_step import clip_loss_fn
    from simseg_tpu.models.clip import CLIPModel

    model = CLIPModel(
        image_tag="efficientnet_test", img_size=64, text_tag="bert_test",
        projection_name="simple", projection_dim=16, pool_name="avg",
        image_k=3, text_k=1, temperature_name="parameter",
        temperature_init=0.02,
    )
    rng = np.random.default_rng(3)
    batch = {
        "image": jnp.asarray(rng.normal(size=(2, 64, 64, 3)).astype(np.float32)),
        "input_ids": jnp.asarray(rng.integers(0, 128, (2, 8))),
        "attention_mask": jnp.ones((2, 8), jnp.int32),
    }
    variables = model.init(jax.random.key(0), batch)
    img, txt, temp = model.apply(variables, batch)
    assert img.shape == (2, 16) and txt.shape == (2, 16)
    # live-BN path mutates batch_stats (freeze_cnn_bn=False semantics)
    _, metrics = clip_loss_fn(model, variables, batch, None, bn_training=True)
    before = jax.tree.leaves(variables["batch_stats"])
    after = jax.tree.leaves(metrics["_new_batch_stats"])
    moved = [not np.allclose(np.asarray(a), np.asarray(b))
             for a, b in zip(before, after)]
    assert any(moved)


def test_convnext_export_round_trip():
    """flax -> torch .pth layout -> flax is bit-identical, and the exported
    keys load into the timm-layout torch fixture with strict=True."""
    from simseg_tpu.checkpoint.torch_export import flax_to_torch

    fmodel = build_convnext("convnext_test")
    variables = fmodel.init(jax.random.key(1), jnp.zeros((1, 32, 32, 3)))
    wrapped = {"params": {"image_encoder": variables["params"]}}
    state, report = flax_to_torch(wrapped, projection="simple", strict=False)
    # drop the non-tower leaves report (no projections in this bare test)
    tmodel = TorchTinyConvNeXt()
    missing, unexpected = tmodel.load_state_dict(
        {k[len("image_encoder.model.model."):]: torch.tensor(v)
         for k, v in state.items()}, strict=True)
    assert not missing and not unexpected

    # round trip back
    def strip(path):
        return (path[0],) + path[2:]

    table = [(pat, (lambda m, f=fn: strip(f(m))), cv)
             for pat, fn, cv in clip_mapping_table()]
    back, rep = torch_to_flax(state, variables, table)
    assert not rep["missing"] and not rep["mismatched"]
    for a, b in zip(jax.tree.leaves(variables), jax.tree.leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_efficientnet_export_round_trip():
    from simseg_tpu.checkpoint.torch_export import flax_to_torch

    fmodel = build_efficientnet("efficientnet_test")
    variables = fmodel.init(jax.random.key(2), jnp.zeros((1, 32, 32, 3)))
    wrapped = {"params": {"image_encoder": variables["params"]},
               "batch_stats": {"image_encoder": variables["batch_stats"]}}
    state, report = flax_to_torch(wrapped, projection="simple", strict=False)
    tmodel = TorchTinyEfficientNet()
    missing, unexpected = tmodel.load_state_dict(
        {k[len("image_encoder.model.model."):]: torch.tensor(v)
         for k, v in state.items()}, strict=True)
    assert not missing and not unexpected

    def strip(path):
        return (path[0],) + path[2:]

    table = [(pat, (lambda m, f=fn: strip(f(m))), cv)
             for pat, fn, cv in clip_mapping_table()]
    back, rep = torch_to_flax(state, variables, table)
    assert not rep["missing"] and not rep["mismatched"]
    for a, b in zip(jax.tree.leaves(variables), jax.tree.leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
