"""Mixture-of-Experts / expert parallelism (ops/moe.py, parallel/tp.py
ep_shardings): routing semantics, ViT integration, EP-sharded training.

Beyond-reference capability (SURVEY.md §2.8 marks EP/MoE absent upstream)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from simseg_tpu.core.optim import build_optimizer
from simseg_tpu.engine import TrainState, make_train_step
from simseg_tpu.ops.moe import MoEMlp
from simseg_tpu.parallel import ep_shardings, make_mesh, shard_batch
from simseg_tpu.utils.collections import AttrDict
from tests.test_models import tiny_clip
from tests.test_train_step import _batch, _cfg

MOE_ARCH = (("moe_experts", 2), ("moe_capacity", 4.0))


def test_moe_matches_per_token_expert():
    """With capacity high enough that nothing drops, the dense-dispatch
    einsum formulation == gate * expert_mlp(token) computed per token."""
    m = MoEMlp(num_experts=2, hidden_dim=8, out_dim=6, capacity_factor=4.0)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 5, 6)).astype(np.float32))
    params = m.init(jax.random.key(0), x)
    y = m.apply(params, x)

    p = params["params"]
    tokens = np.asarray(x).reshape(-1, 6)
    logits = tokens @ np.asarray(p["router"]["kernel"]) + np.asarray(
        p["router"]["bias"])
    probs = np.exp(logits - logits.max(-1, keepdims=True))
    probs /= probs.sum(-1, keepdims=True)
    idx = probs.argmax(-1)
    gate = probs.max(-1)

    from scipy.special import erf

    def gelu(v):
        return v * 0.5 * (1.0 + erf(v / np.sqrt(2.0)))

    out = np.zeros((tokens.shape[0], 6), np.float32)
    for g in range(tokens.shape[0]):
        e = idx[g]
        h = gelu(tokens[g] @ np.asarray(p["w1"])[e] + np.asarray(p["b1"])[e])
        out[g] = gate[g] * (h @ np.asarray(p["w2"])[e] + np.asarray(p["b2"])[e])
    np.testing.assert_allclose(np.asarray(y).reshape(-1, 6), out,
                               rtol=1e-4, atol=1e-5)


def test_moe_capacity_drops_overflow():
    """Tokens beyond an expert's capacity produce zero output (the residual
    carries them); with capacity_factor tiny, most tokens drop."""
    m = MoEMlp(num_experts=2, hidden_dim=8, out_dim=6, capacity_factor=0.01)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 40, 6)).astype(np.float32))
    params = m.init(jax.random.key(0), x)
    y = np.asarray(m.apply(params, x))
    # capacity = max(ceil(40/2*0.01), 1) = 1 -> at most 2 non-zero rows
    nonzero = np.abs(y.reshape(-1, 6)).sum(-1) > 0
    assert nonzero.sum() <= 2


def test_moe_vit_integration_and_aux():
    """moe_experts in the image arch turns every 2nd block's FFN into MoE;
    the Switch aux loss is sown and surfaced in the train metrics."""
    model = tiny_clip(image_arch=MOE_ARCH)
    batch = _batch(8)
    params = model.init(jax.random.key(0), batch)
    p = params["params"]["image_encoder"]
    assert "mlp" in p["blocks_0"] and "moe" in p["blocks_1"]
    assert p["blocks_1"]["moe"]["w1"].shape[0] == 2

    cfg = _cfg()
    mesh = make_mesh()
    tx, set_lr = build_optimizer(cfg, params)
    step = make_train_step(model, tx, set_lr, mesh=mesh, donate=False)
    state = TrainState.create(params, tx)
    state, metrics = step(state, shard_batch(batch, mesh), None, 1e-3)
    assert "moe_aux" in metrics
    # perfectly balanced top-1 routing gives aux = 1; anything sane is O(1)
    assert 0.5 < float(metrics["moe_aux"]) < 4.0
    assert np.isfinite(float(metrics["loss"]))


def test_moe_text_tower_integration():
    """moe_experts in the text arch turns every 2nd BERT layer's FFN into
    MoE; both towers' aux losses are collected (sum over layers)."""
    model = tiny_clip(image_arch=MOE_ARCH, text_arch=MOE_ARCH)
    batch = _batch(8)
    params = model.init(jax.random.key(0), batch)
    t = params["params"]["text_encoder"]
    assert "intermediate" in t["layer_0"] and "moe" in t["layer_1"]
    assert t["layer_1"]["moe"]["w1"].shape[0] == 2

    cfg = _cfg()
    mesh = make_mesh()
    tx, set_lr = build_optimizer(cfg, params)
    step = make_train_step(model, tx, set_lr, mesh=mesh, donate=False)
    state = TrainState.create(params, tx)
    _, m_both = step(state, shard_batch(batch, mesh), None, 1e-3)

    img_only = tiny_clip(image_arch=MOE_ARCH)
    p2 = img_only.init(jax.random.key(0), batch)
    tx2, set_lr2 = build_optimizer(cfg, p2)
    step2 = make_train_step(img_only, tx2, set_lr2, mesh=mesh, donate=False)
    _, m_img = step2(TrainState.create(p2, tx2), shard_batch(batch, mesh),
                     None, 1e-3)
    # two MoE towers sow two aux terms; the summed aux is strictly larger
    # than the single-tower one (each term is ~1 for near-balanced routing)
    assert float(m_both["moe_aux"]) > float(m_img["moe_aux"]) + 0.5


def test_ep_shardings_rules():
    mesh = make_mesh()  # 8-way data
    params = {"params": {"image_encoder": {"blocks_1": {"moe": {
        "router": {"kernel": np.zeros((32, 8), np.float32),
                   "bias": np.zeros((8,), np.float32)},
        "w1": np.zeros((8, 32, 64), np.float32),
        "b1": np.zeros((8, 64), np.float32),
        "w2": np.zeros((8, 64, 32), np.float32),
        "b2": np.zeros((8, 32), np.float32),
    }}}}}
    sh = ep_shardings(params, mesh)
    moe = sh["params"]["image_encoder"]["blocks_1"]["moe"]
    assert moe["w1"].spec == P("data", None, None)
    assert moe["b1"].spec == P("data", None)
    assert moe["router"]["kernel"].spec == P()
    # indivisible expert count falls back to replicated
    odd = {"params": {"moe": {"w1": np.zeros((3, 4, 4), np.float32)}}}
    assert ep_shardings(odd, mesh)["params"]["moe"]["w1"].spec == P()


@pytest.mark.slow
def test_moe_ep_step_matches_replicated():
    """EP-sharded expert weights (+ activation constraint) == the plain
    replicated MoE step."""
    mesh = make_mesh()
    arch = (("moe_experts", 8), ("moe_capacity", 4.0))
    model = tiny_clip(image_arch=arch)
    ep_model = tiny_clip(
        image_arch=arch,
        expert_sharding=NamedSharding(mesh, P(None, "data", None, None)))
    batch = _batch(16)
    params = model.init(jax.random.key(0), batch)
    cfg = _cfg()
    cfg.optim.name = "torch.optim.SGD"
    cfg.optim.param = AttrDict(momentum=0.9)

    tx1, set_lr1 = build_optimizer(cfg, params)
    s1 = TrainState.create(params, tx1)
    step1 = make_train_step(model, tx1, set_lr1, mesh=mesh, donate=False)

    tx2, set_lr2 = build_optimizer(cfg, params)
    factory = make_train_step(ep_model, tx2, set_lr2, mesh=mesh, donate=False,
                              moe_ep=True)
    step2, s2 = factory(TrainState.create(params, tx2))
    w1 = s2.params["params"]["image_encoder"]["blocks_1"]["moe"]["w1"]
    assert not w1.sharding.is_fully_replicated

    for _ in range(2):
        s1, m1 = step1(s1, shard_batch(batch, mesh), None, 1e-3)
        s2, m2 = step2(s2, shard_batch(batch, mesh), None, 1e-3)
    assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), rel=1e-4)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-4, atol=1e-6)


def test_moe_token_mask_excludes_padding():
    """Masked (padding) positions: zero MoE output, no capacity consumed,
    aux statistics over real tokens only."""
    m = MoEMlp(num_experts=2, hidden_dim=8, out_dim=6, capacity_factor=4.0)
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(2, 6, 6)).astype(np.float32))
    mask = jnp.asarray([[1, 1, 1, 0, 0, 0], [1, 1, 1, 1, 0, 0]], jnp.int32)
    params = m.init(jax.random.key(0), x)

    y, inter = m.apply(params, x, True, mask, mutable=["intermediates"])
    y = np.asarray(y)
    # padded positions produce exactly zero
    assert np.abs(y[0, 3:]).max() == 0.0 and np.abs(y[1, 4:]).max() == 0.0
    # real positions match the unmasked forward on the same tokens
    y_full = np.asarray(m.apply(params, x))
    np.testing.assert_allclose(y[0, :3], y_full[0, :3], rtol=1e-5, atol=1e-6)

    # aux computed over real tokens only: replacing PAD embeddings with
    # garbage must not change it
    x2 = x.at[0, 3:].set(1e3)
    _, inter2 = m.apply(params, x2, True, mask, mutable=["intermediates"])
    a1 = float(np.asarray(jax.tree.leaves(inter)[0]))
    a2 = float(np.asarray(jax.tree.leaves(inter2)[0]))
    assert a1 == pytest.approx(a2, rel=1e-6)


def test_bert_moe_masks_padding():
    """The text tower threads its attention mask into the MoE layers."""
    model = tiny_clip(text_arch=MOE_ARCH)
    batch = _batch(4)
    batch = dict(batch)
    mask = np.ones((4, 12), np.int32)
    mask[:, 6:] = 0
    batch["attention_mask"] = jnp.asarray(mask)
    params = model.init(jax.random.key(0), batch)
    (img, txt, temp), inter = model.apply(
        params, batch, deterministic=True, mutable=["intermediates"])
    # garbage in the padded token ids must not move the aux loss
    batch2 = dict(batch)
    batch2["input_ids"] = jnp.asarray(
        np.where(mask, np.asarray(batch["input_ids"]), 99))
    (_, _, _), inter2 = model.apply(
        params, batch2, deterministic=True, mutable=["intermediates"])
    a1 = [float(np.asarray(v)) for v in jax.tree.leaves(inter)]
    a2 = [float(np.asarray(v)) for v in jax.tree.leaves(inter2)]
    np.testing.assert_allclose(a1, a2, rtol=1e-6)


def test_moe_text_with_live_bn_image_tower():
    """A MoE text tower next to a CNN image tower running live BN: the
    mutable apply carries BOTH collections — the aux loss is collected AND
    the step still merges updated batch statistics (previously the MoE
    branch silently dropped live-BN training)."""
    from simseg_tpu.engine.train_step import clip_loss_fn

    model = tiny_clip(image_tag="resnet_test", text_arch=MOE_ARCH)
    batch = _batch(8)
    params = model.init(jax.random.key(0), batch)
    assert "batch_stats" in params

    _, metrics = clip_loss_fn(model, params, batch, None, bn_training=True)
    assert "moe_aux" in metrics and np.isfinite(float(metrics["moe_aux"]))
    new_stats = metrics.get("_new_batch_stats")
    assert new_stats is not None
    # the running statistics actually moved (live BN, not frozen stats)
    before = jax.tree.leaves(params["batch_stats"])
    after = jax.tree.leaves(new_stats)
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(before, after)
    )
    # bn_training=False keeps stats frozen through the same MoE branch
    _, m2 = clip_loss_fn(model, params, batch, None, bn_training=False)
    assert "moe_aux" in m2 and m2.get("_new_batch_stats") is None
