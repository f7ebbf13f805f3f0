"""Reverse checkpoint bridge (flax -> reference-layout torch .pth).

The export must be the exact inverse of the loading bridge: round trips are
bit-identical, and the emitted state dict loads into the torch fixture
models (reference state-dict layout, tests/torch_reference.py) with
``strict=True`` and reproduces the flax model's numbers."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from simseg_tpu.checkpoint.torch_bridge import (
    clip_mapping_table,
    load_clip_checkpoint,
    torch_to_flax,
)
from simseg_tpu.checkpoint.torch_export import flax_to_torch, save_clip_checkpoint
from simseg_tpu.models.clip import CLIPModel
from tests.test_models import tiny_clip
from tests.torch_reference import TorchTinyCLIP, torch_clip_embeddings


def _init_tiny(model, img=32):
    batch = {
        "image": jnp.zeros((1, img, img, 3)),
        "input_ids": jnp.zeros((1, 8), dtype=jnp.int32),
        "attention_mask": jnp.ones((1, 8), dtype=jnp.int32),
    }
    # non-trivial params: init then perturb deterministically
    variables = model.init(jax.random.key(3), batch)
    leaves, treedef = jax.tree.flatten(variables)
    rng = np.random.default_rng(0)
    leaves = [
        np.asarray(x) + rng.normal(scale=0.02, size=np.shape(x)).astype(
            np.asarray(x).dtype)
        if np.issubdtype(np.asarray(x).dtype, np.floating) else x
        for x in leaves
    ]
    return jax.tree.unflatten(treedef, leaves)


def _tree_equal(a, b):
    fa, fb = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(fa) == len(fb)
    for x, y in zip(fa, fb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_vit_round_trip_bit_identical():
    model = tiny_clip()
    variables = _init_tiny(model)
    state, report = flax_to_torch(variables)
    assert not report["skipped"]
    back, rep = torch_to_flax(state, variables, clip_mapping_table(),
                              strict=True)
    assert not rep["unexpected"], rep["unexpected"]
    _tree_equal(variables, back)


def test_vit_strict_load_into_torch_fixture_and_numbers_match():
    """The exported dict IS the reference layout: strict torch-side load,
    then torch and flax produce the same embeddings (reverse direction of
    test_torch_bridge.test_embeddings_match_torch)."""
    model = tiny_clip()
    variables = _init_tiny(model)
    state, _ = flax_to_torch(variables)

    tmodel = TorchTinyCLIP()
    tmodel.load_state_dict({k: torch.from_numpy(v) for k, v in state.items()},
                           strict=True)
    tmodel.eval()

    rng = np.random.default_rng(1)
    image = rng.normal(size=(2, 3, 32, 32)).astype(np.float32)
    ids = rng.integers(0, 128, (2, 10))
    mask = np.ones((2, 10), dtype=np.int64)
    mask[0, 7:] = 0
    with torch.no_grad():
        t_img, t_txt = torch_clip_embeddings(
            tmodel, torch.tensor(image), torch.tensor(ids), torch.tensor(mask)
        )
    batch = {
        "image": jnp.asarray(image.transpose(0, 2, 3, 1)),
        "input_ids": jnp.asarray(ids),
        "attention_mask": jnp.asarray(mask),
    }
    f_img, f_txt, _ = model.apply(variables, batch)
    np.testing.assert_allclose(np.asarray(f_img), t_img.numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(f_txt), t_txt.numpy(),
                               rtol=1e-4, atol=1e-5)


def test_pth_file_round_trip(tmp_path):
    """save_clip_checkpoint -> load_clip_checkpoint is bit-identical and
    fully matched (no missing / mismatched / unexpected keys)."""
    model = tiny_clip()
    variables = _init_tiny(model)
    path = str(tmp_path / "exported.pth")
    save_clip_checkpoint(path, variables, meta={"step": 7})

    loaded = torch.load(path, map_location="cpu", weights_only=True)
    assert loaded["meta"]["step"] == 7
    back, report = load_clip_checkpoint(path, variables, strict=True)
    assert not report["unexpected"], report["unexpected"]
    _tree_equal(variables, back)


def test_resnet_tower_round_trip():
    """CNN tower: params AND batch_stats ride the export; torch BN buffers
    (running stats + num_batches_tracked) come out in torchvision layout."""
    model = CLIPModel(
        image_tag="resnet_test", img_size=32, text_tag="bert_test",
        projection_name="simple", projection_dim=16, pool_name="avg",
        image_k=3, text_k=1, temperature_name="parameter",
        temperature_init=0.02,
    )
    variables = _init_tiny(model, img=32)
    state, report = flax_to_torch(variables)
    assert not report["skipped"]

    from tests.torch_reference import TorchTinyResNet
    want_tower = {
        "image_encoder.model.model." + k
        for k in TorchTinyResNet().state_dict().keys()
    }
    got_tower = {k for k in state if k.startswith("image_encoder.")}
    assert got_tower == want_tower
    nbt = [k for k in state if k.endswith("num_batches_tracked")]
    assert nbt and all(state[k].dtype == np.int64 for k in nbt)

    back, rep = torch_to_flax(state, variables, clip_mapping_table(),
                              strict=True)
    # num_batches_tracked has no flax slot (flax BN keeps no step counter)
    assert all(k.endswith("num_batches_tracked") for k in rep["unexpected"])
    _tree_equal(variables, back)


def test_complex_projection_round_trip():
    model = tiny_clip(projection_name="complex")
    variables = _init_tiny(model)
    state, report = flax_to_torch(variables, projection="complex")
    assert not report["skipped"]
    for k in ("image_projection.projection.weight", "image_projection.fc.bias",
              "text_projection.layer_norm.weight"):
        assert k in state, sorted(state)[:10]
    back, rep = torch_to_flax(state, variables,
                              clip_mapping_table("complex"), strict=True)
    assert not rep["unexpected"], rep["unexpected"]
    _tree_equal(variables, back)


def test_strict_refuses_unmappable_leaves():
    """A param the reference layout has no slot for must raise loudly, not
    vanish from the checkpoint."""
    model = tiny_clip()
    variables = _init_tiny(model)
    variables["params"]["image_encoder"]["not_a_reference_param"] = (
        np.zeros((3,), np.float32))
    with pytest.raises(ValueError, match="no slot"):
        flax_to_torch(variables)
    state, report = flax_to_torch(variables, strict=False)
    assert report["skipped"] == ["params/image_encoder/not_a_reference_param"]
    assert "loss.temperature" in state


TINY_CFG_YAML = """\
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
transforms:
  input_size: 32
"""


@pytest.mark.slow
def test_export_cli(tmp_path):
    """tools/export_torch_checkpoint.py end-to-end: native checkpoint in,
    reference-layout .pth out, bridge-loadable."""
    import subprocess
    import sys
    import os

    from simseg_tpu.checkpoint.native import save_checkpoint

    model = tiny_clip()
    variables = _init_tiny(model)
    ckpt_dir = tmp_path / "ckpt"
    save_checkpoint(str(ckpt_dir), "epoch_1",
                    {"params": jax.device_get(variables)}, meta={"step": 1})
    cfg_path = tmp_path / "tiny.yaml"
    cfg_path.write_text(TINY_CFG_YAML)
    out = tmp_path / "exported_cli.pth"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH=repo + os.pathsep + os.environ.get("PYTHONPATH", ""))
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "tools/export_torch_checkpoint.py"),
         "--cfg", str(cfg_path),
         "--ckpt_path", str(ckpt_dir), "--out", str(out)],
        capture_output=True, text=True, env=env, timeout=600)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert out.exists()
    back, report = load_clip_checkpoint(str(out), variables, strict=True)
    assert not report["unexpected"]
    _tree_equal(variables, back)
