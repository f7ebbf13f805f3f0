"""Tensor parallelism (parallel/tp.py): sharding rules + numerics.

Beyond-reference capability (SURVEY.md §2.8 marks TP absent upstream): the
towers' qkv/MLP kernels are sharded over a 'model' mesh axis and GSPMD
inserts the Megatron collectives. The contract under test: a TP step must
produce the SAME numerics as the plain data-parallel step."""

import jax
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from simseg_tpu.core.optim import build_optimizer
from simseg_tpu.engine import TrainState, make_eval_step, make_train_step
from simseg_tpu.parallel import (
    MODEL_AXIS,
    batch_shards,
    local_batch_size,
    make_mesh,
    shard_batch,
    tp_shardings,
)
from simseg_tpu.utils.collections import AttrDict
from tests.test_models import tiny_clip
from tests.test_train_step import _batch, _cfg


def test_mesh_shapes():
    mesh = make_mesh(tp_size=2)
    assert mesh.axis_names == ("data", "model")
    assert mesh.shape["model"] == 2 and mesh.shape["data"] == 4
    assert batch_shards(mesh) == 4
    assert local_batch_size(16, mesh) == 4

    gm = make_mesh(group_size=2, tp_size=2)
    assert gm.axis_names == ("replica", "data", "model")
    assert dict(gm.shape) == {"replica": 2, "data": 2, "model": 2}
    assert batch_shards(gm) == 4

    with pytest.raises(ValueError):
        make_mesh(tp_size=3)


def test_tp_sharding_rules():
    model = tiny_clip()
    batch = _batch(4)
    params = model.init(jax.random.key(0), batch)
    mesh = make_mesh(tp_size=2)
    sh = tp_shardings(params, mesh)

    p = sh["params"]["image_encoder"]
    assert p["blocks_0"]["attn"]["qkv"]["kernel"].spec == P(None, MODEL_AXIS)
    assert p["blocks_0"]["attn"]["qkv"]["bias"].spec == P(MODEL_AXIS)
    assert p["blocks_0"]["attn"]["proj"]["kernel"].spec == P(MODEL_AXIS, None)
    assert p["blocks_0"]["attn"]["proj"]["bias"].spec == P()
    assert p["blocks_0"]["mlp"]["fc1"]["kernel"].spec == P(None, MODEL_AXIS)
    assert p["blocks_0"]["mlp"]["fc2"]["kernel"].spec == P(MODEL_AXIS, None)
    assert p["patch_embed"]["kernel"].spec == P()
    assert p["pos_embed"].spec == P()

    t = sh["params"]["text_encoder"]
    assert t["layer_0"]["query"]["kernel"].spec == P(None, MODEL_AXIS)
    assert t["layer_0"]["attention_output"]["kernel"].spec == P(MODEL_AXIS, None)
    assert t["layer_0"]["intermediate"]["kernel"].spec == P(None, MODEL_AXIS)
    assert t["layer_0"]["output"]["kernel"].spec == P(MODEL_AXIS, None)
    assert t["word_embeddings"]["embedding"].spec == P()
    # BERT row-parallel 'output' must NOT be confused with col-parallel
    # despite sharing the (D, D)/(4D, D) kernel layout family
    assert t["layer_0"]["output"]["kernel"].spec != t["layer_0"]["intermediate"]["kernel"].spec


def test_tp_indivisible_falls_back_replicated():
    mesh = make_mesh(tp_size=2)
    params = {"params": {"image_encoder": {"blocks_0": {"attn": {"qkv": {
        "kernel": np.zeros((6, 9), np.float32),  # 9 % 2 != 0
        "bias": np.zeros((9,), np.float32),
    }}}}}}
    sh = tp_shardings(params, mesh)
    q = sh["params"]["image_encoder"]["blocks_0"]["attn"]["qkv"]
    assert q["kernel"].spec == P() and q["bias"].spec == P()


@pytest.mark.parametrize("tp", [2, 4])
def test_tp_step_matches_dp(tp):
    """3 SGD steps under (data, model) sharding == 3 plain DP steps."""
    model = tiny_clip()
    batch = _batch(16)
    params = model.init(jax.random.key(0), batch)
    cfg = _cfg()
    cfg.optim.name = "torch.optim.SGD"
    cfg.optim.param = AttrDict(momentum=0.9)

    tx1, set_lr1 = build_optimizer(cfg, params)
    s1 = TrainState.create(params, tx1)
    dp_mesh = make_mesh()
    step1 = make_train_step(model, tx1, set_lr1, mesh=dp_mesh, donate=False)
    b1 = shard_batch(batch, dp_mesh)

    mesh = make_mesh(tp_size=tp)
    tx2, set_lr2 = build_optimizer(cfg, params)
    s2 = TrainState.create(params, tx2)
    factory = make_train_step(model, tx2, set_lr2, mesh=mesh, donate=False)
    step2, s2 = factory(s2)
    b2 = shard_batch(batch, mesh)

    # the qkv kernel is physically sharded over 'model'
    qkv = s2.params["params"]["image_encoder"]["blocks_0"]["attn"]["qkv"]["kernel"]
    assert not qkv.sharding.is_fully_replicated
    # and its Adam-free SGD momentum mirrors the param sharding
    mom = [
        x for x in jax.tree.leaves(s2.opt_state)
        if hasattr(x, "shape") and x.shape == qkv.shape
    ]
    assert mom and all(not m.sharding.is_fully_replicated for m in mom)

    for _ in range(3):
        s1, m1 = step1(s1, b1, None, 1e-3)
        s2, m2 = step2(s2, b2, None, 1e-3)
    assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), rel=1e-4)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-4, atol=1e-6)


@pytest.mark.slow
def test_tp_with_grouped_negatives_and_zero1():
    """TP composes with the grouped contrastive mesh and ZeRO-1 moments."""
    model = tiny_clip()
    batch = _batch(16)
    params = model.init(jax.random.key(0), batch)
    cfg = _cfg()
    cfg.optim.name = "torch.optim.SGD"
    cfg.optim.param = AttrDict(momentum=0.9)

    # baseline: plain DP with block-diagonal (group_size=8) negatives
    dp_mesh = make_mesh()
    tx1, set_lr1 = build_optimizer(cfg, params)
    s1 = TrainState.create(params, tx1)
    step1 = make_train_step(model, tx1, set_lr1, mesh=dp_mesh, donate=False,
                            group_size=8)

    gm = make_mesh(group_size=2, tp_size=2)
    tx2, set_lr2 = build_optimizer(cfg, params)
    s2 = TrainState.create(params, tx2)
    factory = make_train_step(model, tx2, set_lr2, mesh=gm, donate=False,
                              group_size=8, shard_opt_state=True,
                              opt_shard_min_size=512)
    step2, s2 = factory(s2)

    for _ in range(2):
        s1, m1 = step1(s1, shard_batch(batch, dp_mesh), None, 1e-3)
        s2, m2 = step2(s2, shard_batch(batch, gm), None, 1e-3)
    assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), rel=1e-4)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-4, atol=1e-6)


def test_tp_eval_step_keeps_param_sharding():
    model = tiny_clip()
    batch = _batch(8)
    params = model.init(jax.random.key(0), batch)
    mesh = make_mesh(tp_size=2)
    from simseg_tpu.parallel import place_params_tp

    placed = place_params_tp(params, mesh)
    eval_step = make_eval_step(model, mesh)
    img, txt = eval_step(placed, shard_batch(batch, mesh))
    assert img.shape == (8, 16) and txt.shape == (8, 16)
    assert np.isfinite(np.asarray(img)).all()


def test_sp_step_matches_dp():
    """Sequence-parallel residual stream (act_sharding) on a TP mesh ==
    plain DP numerics."""
    from jax.sharding import NamedSharding

    model = tiny_clip()
    batch = _batch(16)
    params = model.init(jax.random.key(0), batch)
    cfg = _cfg()
    cfg.optim.name = "torch.optim.SGD"
    cfg.optim.param = AttrDict(momentum=0.0)

    dp_mesh = make_mesh()
    tx1, set_lr1 = build_optimizer(cfg, params)
    s1 = TrainState.create(params, tx1)
    step1 = make_train_step(model, tx1, set_lr1, mesh=dp_mesh, donate=False)

    mesh = make_mesh(tp_size=2)
    sp_model = model.clone(act_sharding=NamedSharding(
        mesh, P(None, MODEL_AXIS, None)))
    tx2, set_lr2 = build_optimizer(cfg, params)
    factory = make_train_step(sp_model, tx2, set_lr2, mesh=mesh, donate=False)
    step2, s2 = factory(TrainState.create(params, tx2))

    for _ in range(2):
        s1, m1 = step1(s1, shard_batch(batch, dp_mesh), None, 1e-3)
        s2, m2 = step2(s2, shard_batch(batch, mesh), None, 1e-3)
    assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), rel=1e-4)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-4, atol=1e-6)


def test_sp_requires_tp_in_factory():
    from simseg_tpu.models.clip import build_clip_model
    from simseg_tpu.utils.collections import AttrDict as AD

    cfg = AD()
    cfg.dist = AD(sp=True, bf16=False)
    with pytest.raises(ValueError, match="tp_size"):
        build_clip_model(cfg, mesh=make_mesh())


def test_fsdp_shardings_specs():
    from simseg_tpu.parallel.tp import fsdp_shardings

    mesh = make_mesh()  # 8-way data
    params = {"params": {
        "big": np.zeros((1024, 256), np.float32),
        "tiny": np.zeros((8,), np.float32),
        "odd": np.zeros((100001,), np.float32),  # indivisible by 8
    }}
    sh = fsdp_shardings(params, mesh, min_size=1024)
    assert sh["params"]["big"].spec == P("data", None)
    assert sh["params"]["tiny"].spec == P()
    assert sh["params"]["odd"].spec == P()

    # composes with TP: a col-parallel kernel gains 'data' on dim 0
    tpm = make_mesh(tp_size=2)
    base = {"params": {"blocks_0": {"attn": {"qkv": {
        "kernel": np.zeros((256, 768), np.float32)}}}}}
    combined = fsdp_shardings(base, tpm, base=tp_shardings(base, tpm),
                              min_size=1024)
    assert combined["params"]["blocks_0"]["attn"]["qkv"]["kernel"].spec == \
        P("data", MODEL_AXIS)


def test_fsdp_step_matches_dp():
    """ZeRO-3-style fully-sharded params: same numerics as plain DP, params
    and moments physically sharded over 'data'."""
    model = tiny_clip()
    batch = _batch(16)
    params = model.init(jax.random.key(0), batch)
    cfg = _cfg()
    cfg.optim.name = "torch.optim.SGD"
    cfg.optim.param = AttrDict(momentum=0.9)

    dp_mesh = make_mesh()
    tx1, set_lr1 = build_optimizer(cfg, params)
    s1 = TrainState.create(params, tx1)
    step1 = make_train_step(model, tx1, set_lr1, mesh=dp_mesh, donate=False)

    tx2, set_lr2 = build_optimizer(cfg, params)
    factory = make_train_step(model, tx2, set_lr2, mesh=dp_mesh, donate=False,
                              fsdp=True, fsdp_min_size=512)
    step2, s2 = factory(TrainState.create(params, tx2))

    emb = s2.params["params"]["text_encoder"]["word_embeddings"]["embedding"]
    assert not emb.sharding.is_fully_replicated
    mom = [x for x in jax.tree.leaves(s2.opt_state)
           if hasattr(x, "shape") and x.shape == emb.shape]
    assert mom and all(not m.sharding.is_fully_replicated for m in mom)

    for _ in range(3):
        s1, m1 = step1(s1, shard_batch(batch, dp_mesh), None, 1e-3)
        s2, m2 = step2(s2, shard_batch(batch, dp_mesh), None, 1e-3)
    assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), rel=1e-4)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-4, atol=1e-6)


@pytest.mark.slow
def test_fsdp_tp_combo_matches_dp():
    model = tiny_clip()
    batch = _batch(16)
    params = model.init(jax.random.key(0), batch)
    cfg = _cfg()
    cfg.optim.name = "torch.optim.SGD"
    cfg.optim.param = AttrDict(momentum=0.0)

    dp_mesh = make_mesh()
    tx1, set_lr1 = build_optimizer(cfg, params)
    s1 = TrainState.create(params, tx1)
    step1 = make_train_step(model, tx1, set_lr1, mesh=dp_mesh, donate=False)

    mesh = make_mesh(tp_size=2)
    tx2, set_lr2 = build_optimizer(cfg, params)
    factory = make_train_step(model, tx2, set_lr2, mesh=mesh, donate=False,
                              fsdp=True, fsdp_min_size=512)
    step2, s2 = factory(TrainState.create(params, tx2))

    qkv = s2.params["params"]["image_encoder"]["blocks_0"]["attn"]["qkv"]["kernel"]
    assert qkv.sharding.spec == P("data", MODEL_AXIS)

    for _ in range(2):
        s1, m1 = step1(s1, shard_batch(batch, dp_mesh), None, 1e-3)
        s2, m2 = step2(s2, shard_batch(batch, mesh), None, 1e-3)
    assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), rel=1e-4)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-4, atol=1e-6)
