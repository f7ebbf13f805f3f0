"""End-to-end checkpoint-bridge parity: a torch model with reference state-
dict layout is saved as .pth, loaded into the flax tree, and both frameworks
must produce identical embeddings (SURVEY.md §7 hard-part 2)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from simseg_tpu.checkpoint.torch_bridge import (
    convert_keys,
    load_clip_checkpoint,
    load_torch_state_dict,
)
from simseg_tpu.ops.interpolate_pe import interpolate_pos_embed
from tests.test_models import tiny_clip
from tests.torch_reference import TorchTinyCLIP, torch_clip_embeddings


@pytest.fixture(scope="module")
def bridged(tmp_path_factory):
    torch.manual_seed(0)
    tmodel = TorchTinyCLIP()
    # non-trivial params everywhere
    with torch.no_grad():
        for p in tmodel.parameters():
            if p.ndim > 0:
                p.add_(torch.randn_like(p) * 0.02)
    path = tmp_path_factory.mktemp("ckpt") / "tiny.pth"
    torch.save({"state_dict": tmodel.state_dict()}, path)

    fmodel = tiny_clip()
    dummy = {
        "image": jnp.zeros((1, 32, 32, 3)),
        "input_ids": jnp.zeros((1, 8), dtype=jnp.int32),
        "attention_mask": jnp.ones((1, 8), dtype=jnp.int32),
    }
    params = fmodel.init(jax.random.key(0), dummy)
    new_params, report = load_clip_checkpoint(str(path), params)
    return tmodel, fmodel, new_params, report


def test_all_keys_mapped(bridged):
    _, _, _, report = bridged
    assert not report["missing"], report["missing"]
    assert not report["mismatched"], report["mismatched"]
    assert not report["unexpected"], report["unexpected"]


def test_embeddings_match_torch(bridged):
    tmodel, fmodel, params, _ = bridged
    rng = np.random.default_rng(0)
    image = rng.normal(size=(3, 3, 32, 32)).astype(np.float32)  # NCHW for torch
    ids = rng.integers(0, 128, (3, 10))
    mask = np.ones((3, 10), dtype=np.int64)
    mask[0, 6:] = 0

    with torch.no_grad():
        t_img, t_txt = torch_clip_embeddings(
            tmodel, torch.tensor(image), torch.tensor(ids), torch.tensor(mask)
        )

    batch = {
        "image": jnp.asarray(image.transpose(0, 2, 3, 1)),  # NHWC for flax
        "input_ids": jnp.asarray(ids),
        "attention_mask": jnp.asarray(mask),
    }
    f_img, f_txt, temp = fmodel.apply(params, batch)

    np.testing.assert_allclose(np.asarray(f_img), t_img.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(f_txt), t_txt.numpy(), rtol=1e-4, atol=1e-5)
    assert float(temp) == pytest.approx(0.03, abs=1e-6)


def test_image_tokens_match_torch(bridged):
    """Dense patch tokens (seg decode input) must match too."""
    tmodel, fmodel, params, _ = bridged
    rng = np.random.default_rng(1)
    image = rng.normal(size=(2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        t_tokens = tmodel.image_encoder.model.model(torch.tensor(image))
    f_tokens = fmodel.apply(
        params,
        jnp.asarray(image.transpose(0, 2, 3, 1)),
        method=lambda m, img: m.forward_image_tokens(img),
    )
    np.testing.assert_allclose(
        np.asarray(f_tokens), t_tokens.numpy(), rtol=1e-4, atol=1e-5
    )


def test_pos_embed_interpolation_matches_torch_bicubic():
    rng = np.random.default_rng(2)
    pe = rng.normal(size=(1, 1 + 16, 8)).astype(np.float32)  # 4x4 grid
    got = np.asarray(interpolate_pos_embed(jnp.asarray(pe), new_num_patches=36))
    # torch reference computation (interpolate_pe.py:14-25)
    grid = torch.tensor(pe[:, 1:]).reshape(1, 4, 4, 8).permute(0, 3, 1, 2)
    up = torch.nn.functional.interpolate(
        grid, size=(6, 6), mode="bicubic", align_corners=False
    )
    want = np.concatenate(
        [pe[:, :1], up.permute(0, 2, 3, 1).reshape(1, 36, 8).numpy()], axis=1
    )
    assert got.shape == (1, 37, 8)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_convert_keys_prefix_rules():
    state = {"backbone.layer.weight": np.zeros(2), "head.weight": np.ones(2)}
    out = convert_keys(state, ["backbone.->encoder."])
    assert "encoder.layer.weight" in out and "head.weight" in out


def test_load_only_image_encoder(bridged, tmp_path):
    tmodel, fmodel, _, _ = bridged
    path = tmp_path / "t.pth"
    torch.save({"state_dict": tmodel.state_dict()}, path)
    dummy = {
        "image": jnp.zeros((1, 32, 32, 3)),
        "input_ids": jnp.zeros((1, 8), dtype=jnp.int32),
        "attention_mask": jnp.ones((1, 8), dtype=jnp.int32),
    }
    params = tiny_clip().init(jax.random.key(1), dummy)
    new_params, report = load_clip_checkpoint(
        str(path), params, only_image_encoder=True
    )
    # text tower untouched, image tower loaded
    t_cls = tmodel.image_encoder.model.model.cls_token.detach().numpy()
    np.testing.assert_allclose(
        np.asarray(new_params["params"]["image_encoder"]["cls_token"]), t_cls
    )
    orig_word = params["params"]["text_encoder"]["word_embeddings"]["embedding"]
    np.testing.assert_allclose(
        np.asarray(new_params["params"]["text_encoder"]["word_embeddings"]["embedding"]),
        np.asarray(orig_word),
    )


def test_load_only_image_encoder_strict_ok(bridged, tmp_path):
    """A tower filter necessarily leaves the other tower 'missing'; like
    the reference (checkpoint.py:46-53) the load drops to non-strict
    instead of raising."""
    tmodel, fmodel, _, _ = bridged
    path = tmp_path / "t.pth"
    torch.save({"state_dict": tmodel.state_dict()}, path)
    dummy = {
        "image": jnp.zeros((1, 32, 32, 3)),
        "input_ids": jnp.zeros((1, 8), dtype=jnp.int32),
        "attention_mask": jnp.ones((1, 8), dtype=jnp.int32),
    }
    params = tiny_clip().init(jax.random.key(1), dummy)
    new_params, report = load_clip_checkpoint(
        str(path), params, only_image_encoder=True, strict=True
    )
    t_cls = tmodel.image_encoder.model.model.cls_token.detach().numpy()
    np.testing.assert_allclose(
        np.asarray(new_params["params"]["image_encoder"]["cls_token"]), t_cls
    )
    assert report["missing"]  # the filtered-out text tower, tolerated
