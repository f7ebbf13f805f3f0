import math

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from simseg_tpu.core.lr_schedule import LR, build_schedule
from simseg_tpu.core.optim import build_optimizer
from simseg_tpu.utils.collections import AttrDict


def test_cosine_schedule_values():
    fn = LR.get("cosine_schedule_with_warmup")(
        init_lr=1.0, num_warmup_steps=10, num_training_steps=110, num_cycles=0.5
    )
    assert fn(0) == 0.0
    assert fn(5) == pytest.approx(0.5)
    assert fn(10) == pytest.approx(1.0)
    assert fn(60) == pytest.approx(0.5, abs=1e-6)  # halfway through cosine
    assert fn(110) == pytest.approx(0.0, abs=1e-9)


def test_cosine_min_lr_scale():
    fn = LR.get("cosine_schedule_with_warmup_min_lr_scale")(
        init_lr=2.0, num_warmup_steps=0, num_training_steps=100,
        num_cycles=0.5, min_lr_scale=0.1,
    )
    assert fn(0) == pytest.approx(2.0)
    assert fn(100) == pytest.approx(0.2)


def test_multi_step_schedule():
    fn = LR.get("multi_step_schedule_with_warmup")(
        init_lr=1.0, num_warmup_steps=0, milestone_steps=[10, 20], gamma=0.1
    )
    assert fn(5) == 1.0
    assert fn(15) == pytest.approx(0.1)
    assert fn(25) == pytest.approx(0.01)


def test_build_schedule_warmup_proportion():
    cfg = AttrDict()
    cfg.optim = AttrDict()
    cfg.optim.lr = AttrDict()
    cfg.optim.lr.name = "linear_schedule_with_warmup"
    cfg.optim.lr.init = 1.0
    cfg.optim.lr.warmup_proportion = 0.1
    cfg.optim.lr.param = AttrDict()
    fn = build_schedule(cfg, total_steps=100)
    assert fn(5) == pytest.approx(0.5)
    assert fn(10) == pytest.approx(1.0)


def _optim_cfg(**kw):
    cfg = AttrDict()
    cfg.optim = AttrDict()
    cfg.optim.name = kw.get("name", "torch.optim.AdamW")
    cfg.optim.param = AttrDict(kw.get("param", dict(betas=(0.9, 0.98), eps=1e-6,
                                                    weight_decay=0.01)))
    cfg.optim.param_group_rules = AttrDict(kw.get("rules", {}))
    cfg.optim.grad_clip = AttrDict(kw.get("grad_clip", {}))
    return cfg


def test_adamw_step_with_host_lr():
    params = {"w": jnp.ones((4,)), "b": jnp.zeros((2,))}
    cfg = _optim_cfg()
    tx, set_lr = build_optimizer(cfg, params)
    state = tx.init(params)
    grads = {"w": jnp.full((4,), 0.5), "b": jnp.ones((2,))}

    state = set_lr(state, 1e-2)
    updates, state = tx.update(grads, state, params)
    new_params = optax.apply_updates(params, updates)
    assert float(new_params["w"][0]) < 1.0  # moved against gradient

    # lr=0 -> no movement
    state0 = set_lr(state, 0.0)
    updates0, _ = tx.update(grads, state0, new_params)
    assert all(
        np.allclose(np.asarray(u), 0.0) for u in jax.tree.leaves(updates0)
    )


def test_param_group_rules_lr_mult():
    params = {"encoder": {"kernel": jnp.ones((3,))}, "head": {"kernel": jnp.ones((3,))}}
    cfg = _optim_cfg(
        name="torch.optim.SGD",
        param=dict(momentum=0.0),
        rules={"head_rule": {"pattern": r"^head/", "lr_mult": 10.0}},
    )
    tx, set_lr = build_optimizer(cfg, params)
    state = tx.init(params)
    state = set_lr(state, 0.1)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    # head gets 10x the lr
    np.testing.assert_allclose(np.asarray(updates["encoder"]["kernel"]), -0.1, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(updates["head"]["kernel"]), -1.0, rtol=1e-6)


def test_grad_clip():
    params = {"w": jnp.zeros((2,))}
    cfg = _optim_cfg(name="torch.optim.SGD", param=dict(momentum=0.0),
                     grad_clip={"max_norm": 1.0})
    tx, set_lr = build_optimizer(cfg, params)
    state = set_lr(tx.init(params), 1.0)
    grads = {"w": jnp.asarray([30.0, 40.0])}  # norm 50 -> clipped to 1
    updates, _ = tx.update(grads, state, params)
    np.testing.assert_allclose(
        np.asarray(updates["w"]), [-0.6, -0.8], rtol=1e-5
    )


def test_lars_builds_and_steps():
    params = {"w": jnp.ones((8, 8))}
    cfg = _optim_cfg(name="LARS", param=dict(momentum=0.9, weight_decay=1e-4))
    tx, set_lr = build_optimizer(cfg, params)
    state = set_lr(tx.init(params), 0.1)
    grads = {"w": jnp.full((8, 8), 0.1)}
    updates, _ = tx.update(grads, state, params)
    assert np.all(np.isfinite(np.asarray(updates["w"])))


def test_reference_rule_format_and_freezing():
    """Rules in the reference format ({'regex', 'param': {'lr', ...}}) and
    frozen-pattern subtrees (requires_grad=False parity)."""
    from simseg_tpu.core.optim import build_optimizer
    from simseg_tpu.utils.collections import AttrDict, OpenDict

    params = {"params": {"image_encoder": {"w": jnp.ones(3)},
                         "head": {"w": jnp.ones(3)}}}
    cfg = AttrDict()
    cfg.optim = AttrDict()
    cfg.optim.name = "torch.optim.SGD"
    cfg.optim.param = OpenDict(momentum=0.0)
    cfg.optim.param_group_rules = OpenDict(
        head_rule={"regex": r"^params/head/", "param": {"lr": 1.0}}
    )
    cfg.optim.grad_clip = OpenDict()
    cfg.optim.lr = AttrDict()
    cfg.optim.lr.init = 0.1

    tx, set_lr = build_optimizer(cfg, params,
                                 frozen_patterns=(r"^params/image_encoder/",))
    state = set_lr(tx.init(params), 0.1)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    # frozen subtree: zero update
    np.testing.assert_allclose(
        np.asarray(updates["params"]["image_encoder"]["w"]), 0.0)
    # head rule: absolute lr 1.0 -> mult 10 over base 0.1
    np.testing.assert_allclose(
        np.asarray(updates["params"]["head"]["w"]), -1.0, rtol=1e-6)


def test_nan_guard_skips_bad_updates():
    from simseg_tpu.core.optim import build_optimizer
    from simseg_tpu.utils.collections import AttrDict, OpenDict

    params = {"w": jnp.ones(2)}
    cfg = AttrDict()
    cfg.optim = AttrDict()
    cfg.optim.name = "torch.optim.SGD"
    cfg.optim.param = OpenDict(momentum=0.0)
    cfg.optim.param_group_rules = OpenDict()
    cfg.optim.grad_clip = OpenDict()
    cfg.optim.skip_nonfinite = 3
    cfg.optim.lr = AttrDict()
    cfg.optim.lr.init = 0.1

    tx, set_lr = build_optimizer(cfg, params)
    state = set_lr(tx.init(params), 0.1)
    bad = {"w": jnp.asarray([jnp.nan, 1.0])}
    updates, state = tx.update(bad, state, params)
    np.testing.assert_allclose(np.asarray(updates["w"]), 0.0)  # skipped
    good = {"w": jnp.ones(2)}
    updates, state = tx.update(good, state, params)
    np.testing.assert_allclose(np.asarray(updates["w"]), -0.1, rtol=1e-6)


def test_grad_accum_matches_mean_gradient():
    """optim.grad_accum_steps=k: k micro updates == one update with the
    mean of the k micro gradients (optax.MultiSteps), and set_lr reaches
    the inner inject_hyperparams state through the MultiSteps wrapper."""
    cfg = AttrDict()
    cfg.optim = AttrDict()
    cfg.optim.name = "torch.optim.SGD"
    cfg.optim.param = AttrDict(momentum=0.0)
    cfg.optim.param_group_rules = AttrDict()
    cfg.optim.grad_clip = AttrDict()
    cfg.optim.lr = AttrDict(init=1.0)
    params = {"w": jnp.asarray([1.0, 2.0])}

    cfg.optim.grad_accum_steps = 2
    tx, set_lr = build_optimizer(cfg, params)
    state = set_lr(tx.init(params), 0.1)
    g1 = {"w": jnp.asarray([1.0, 0.0])}
    g2 = {"w": jnp.asarray([0.0, 3.0])}
    up1, state = tx.update(g1, state, params)
    np.testing.assert_allclose(np.asarray(up1["w"]), 0.0)  # accumulating
    up2, state = tx.update(g2, state, params)
    # applied update = -lr * mean(g1, g2)
    np.testing.assert_allclose(np.asarray(up2["w"]), [-0.05, -0.15],
                               rtol=1e-6)

    # k=1 path unchanged
    cfg.optim.grad_accum_steps = 1
    tx1, set_lr1 = build_optimizer(cfg, params)
    s1 = set_lr1(tx1.init(params), 0.1)
    u, _ = tx1.update(g1, s1, params)
    np.testing.assert_allclose(np.asarray(u["w"]), [-0.1, 0.0], rtol=1e-6)


def test_adam_sgd_coupled_weight_decay():
    """optim.param.weight_decay with torch.optim.Adam / SGD applies as
    torch's COUPLED L2 (folded into the gradient before the moments) —
    previously it was silently dropped."""
    from simseg_tpu.core.optim import build_optimizer
    from simseg_tpu.utils.collections import AttrDict

    for name, decay_free in (("torch.optim.Adam", "adam"),
                             ("torch.optim.SGD", "sgd")):
        cfg = AttrDict()
        cfg.optim = AttrDict(
            name=name,
            param=AttrDict(betas=(0.9, 0.999), eps=1e-8, momentum=0.0,
                           weight_decay=0.1),
            param_group_rules=AttrDict(), grad_clip=AttrDict(),
        )
        params = {"w": jnp.asarray([1.0, -2.0])}
        grads = {"w": jnp.asarray([0.5, 0.5])}
        tx, set_lr = build_optimizer(cfg, params)
        st = tx.init(params)
        st = set_lr(st, 0.01)
        upd, _ = tx.update(grads, st, params)

        cfg0 = AttrDict()
        cfg0.optim = AttrDict(
            name=name,
            param=AttrDict(betas=(0.9, 0.999), eps=1e-8, momentum=0.0,
                           weight_decay=0.0),
            param_group_rules=AttrDict(), grad_clip=AttrDict(),
        )
        tx0, set_lr0 = build_optimizer(cfg0, params)
        st0 = tx0.init(params)
        st0 = set_lr0(st0, 0.01)
        # wd=0 on the decayed gradient == wd>0 on the raw gradient
        # (coupled L2: the decay term enters BEFORE the moment updates)
        coupled = {"w": grads["w"] + 0.1 * params["w"]}
        upd_ref, _ = tx0.update(coupled, st0, params)
        np.testing.assert_allclose(np.asarray(upd["w"]),
                                   np.asarray(upd_ref["w"]), rtol=1e-6)
