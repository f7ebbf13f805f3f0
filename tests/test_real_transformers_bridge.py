"""Bridge validation against the REAL transformers library (round-1 VERDICT
Next #9): the mapping table must consume genuine HF BertModel state-dict
naming — not only our hand-built torch fixture — and the bridged weights
must reproduce the HF forward exactly.

timm is not installed in this environment, so the ViT side stays pinned by
the fixture (tests/torch_reference.py) plus an explicit expected-key-list
check here against the documented timm-0.6.13 layout."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from simseg_tpu.checkpoint.torch_bridge import clip_mapping_table, torch_to_flax
from simseg_tpu.models.bert import BertEncoder

transformers = pytest.importorskip("transformers")


def _tiny_hf_bert():
    cfg = transformers.BertConfig(
        vocab_size=120,
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=2,
        intermediate_size=64,
        max_position_embeddings=48,
        type_vocab_size=2,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
        position_embedding_type="absolute",
    )
    torch.manual_seed(0)
    model = transformers.BertModel(cfg, add_pooling_layer=False)
    model.eval()
    return model


@pytest.fixture(scope="module")
def bridged_hf():
    tmodel = _tiny_hf_bert()
    # reference layout: CLIPModel.text_encoder.model = HuggingFaceModel whose
    # .model is the AutoModel BERT (huggingface_builder.py:6-14), so keys are
    # text_encoder.model.model.<hf-key>
    state = {
        "text_encoder.model.model." + k: v.detach().numpy()
        for k, v in tmodel.state_dict().items()
    }
    fmodel = BertEncoder(vocab_size=120, hidden_dim=32, depth=2, num_heads=2,
                         intermediate_dim=64, max_position=48,
                         type_vocab_size=2)
    variables = fmodel.init(
        jax.random.key(0), jnp.zeros((1, 8), jnp.int32),
        jnp.ones((1, 8), jnp.int32),
    )
    # strip the 'text_encoder' tree level: the bare encoder's params sit at
    # the root of its own variables dict
    table = []
    for pat, fn, cv in clip_mapping_table():
        def strip(m, f=fn):
            path = f(m)
            return tuple(p for p in path if p != "text_encoder")
        table.append((pat, strip, cv))
    new_vars, report = torch_to_flax(state, variables, table)
    return tmodel, fmodel, new_vars, report


def test_real_hf_state_dict_fully_mapped(bridged_hf):
    """Every real HF 4.x BertModel key must be consumed and every flax param
    filled — catches naming drift the builder-authored fixture cannot."""
    _, _, _, report = bridged_hf
    assert not report["missing"], report["missing"]
    assert not report["mismatched"], report["mismatched"]
    # position_ids buffer (non-parameter) may legitimately be unexpected
    unexpected = [k for k in report["unexpected"]
                  if "position_ids" not in k]
    assert not unexpected, unexpected


def test_real_hf_forward_matches_bridged(bridged_hf):
    tmodel, fmodel, new_vars, _ = bridged_hf
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 120, (3, 12))
    mask = np.ones((3, 12), np.int64)
    mask[1, 8:] = 0
    with torch.no_grad():
        want = tmodel(
            input_ids=torch.tensor(ids),
            attention_mask=torch.tensor(mask),
        ).last_hidden_state.numpy()
    got = np.asarray(fmodel.apply(
        new_vars, jnp.asarray(ids), jnp.asarray(mask)
    ))
    # HF masks attention with -inf-ish bias exactly like ours; padded rows
    # still produce outputs — compare everything
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_timm_0613_vit_key_inventory_fully_mapped():
    """Without timm installed, pin the documented timm-0.6.13 ViT state-dict
    key inventory (vision_transformer.py layout: patch_embed.proj, cls_token,
    pos_embed, blocks.N.{norm1,attn.qkv,attn.proj,norm2,mlp.fc1,mlp.fc2},
    norm) and assert the bridge consumes every key for a 2-block model."""
    from simseg_tpu.models.vit import VisionTransformer

    depth, dim = 2, 32
    keys = ["patch_embed.proj.weight", "patch_embed.proj.bias",
            "cls_token", "pos_embed"]
    for i in range(depth):
        for sub in ("norm1", "norm2"):
            keys += [f"blocks.{i}.{sub}.weight", f"blocks.{i}.{sub}.bias"]
        keys += [f"blocks.{i}.attn.qkv.weight", f"blocks.{i}.attn.qkv.bias",
                 f"blocks.{i}.attn.proj.weight", f"blocks.{i}.attn.proj.bias",
                 f"blocks.{i}.mlp.fc1.weight", f"blocks.{i}.mlp.fc1.bias",
                 f"blocks.{i}.mlp.fc2.weight", f"blocks.{i}.mlp.fc2.bias"]
    keys += ["norm.weight", "norm.bias"]

    shapes = {
        "patch_embed.proj.weight": (dim, 3, 8, 8),
        "patch_embed.proj.bias": (dim,),
        "cls_token": (1, 1, dim),
        "pos_embed": (1, 17, dim),
        "norm.weight": (dim,), "norm.bias": (dim,),
    }
    for i in range(depth):
        shapes.update({
            f"blocks.{i}.norm1.weight": (dim,), f"blocks.{i}.norm1.bias": (dim,),
            f"blocks.{i}.norm2.weight": (dim,), f"blocks.{i}.norm2.bias": (dim,),
            f"blocks.{i}.attn.qkv.weight": (3 * dim, dim),
            f"blocks.{i}.attn.qkv.bias": (3 * dim,),
            f"blocks.{i}.attn.proj.weight": (dim, dim),
            f"blocks.{i}.attn.proj.bias": (dim,),
            f"blocks.{i}.mlp.fc1.weight": (4 * dim, dim),
            f"blocks.{i}.mlp.fc1.bias": (4 * dim,),
            f"blocks.{i}.mlp.fc2.weight": (dim, 4 * dim),
            f"blocks.{i}.mlp.fc2.bias": (dim,),
        })
    rng = np.random.default_rng(0)
    state = {
        "image_encoder.model.model." + k:
            rng.normal(size=shapes[k]).astype(np.float32)
        for k in keys
    }

    fmodel = VisionTransformer(img_size=32, patch_size=8, embed_dim=dim,
                               depth=depth, num_heads=2)
    variables = fmodel.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
    table = []
    for pat, fn, cv in clip_mapping_table():
        def strip(m, f=fn):
            return tuple(p for p in f(m) if p != "image_encoder")
        table.append((pat, strip, cv))
    _, report = torch_to_flax(state, variables, table)
    assert not report["missing"], report["missing"]
    assert not report["mismatched"], report["mismatched"]
    assert not report["unexpected"], report["unexpected"]


def test_in21k_pre_logits_keys_tolerated():
    """timm in21k ViTs may carry an unused pre_logits representation head
    (reference vit_builder forward never calls it) — such keys must land in
    the 'unexpected' bucket without blocking the load."""
    import numpy as np
    from simseg_tpu.models.vit import VisionTransformer

    fmodel = VisionTransformer(img_size=32, patch_size=8, embed_dim=32,
                               depth=1, num_heads=2)
    variables = fmodel.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
    rng = np.random.default_rng(0)
    state = {
        "image_encoder.model.model.pre_logits.fc.weight":
            rng.normal(size=(32, 32)).astype(np.float32),
        "image_encoder.model.model.pre_logits.fc.bias":
            rng.normal(size=(32,)).astype(np.float32),
        "image_encoder.model.model.norm.weight":
            rng.normal(size=(32,)).astype(np.float32),
        "image_encoder.model.model.norm.bias":
            rng.normal(size=(32,)).astype(np.float32),
    }
    table = []
    for pat, fn, cv in clip_mapping_table():
        def strip(m, f=fn):
            return tuple(p for p in f(m) if p != "image_encoder")
        table.append((pat, strip, cv))
    new_vars, report = torch_to_flax(state, variables, table)
    assert sorted(report["unexpected"]) == [
        "image_encoder.model.model.pre_logits.fc.bias",
        "image_encoder.model.model.pre_logits.fc.weight",
    ]
    assert "image_encoder.model.model.norm.weight" in report["matched"]
