"""ZeRO-1 optimizer-state sharding: numerics identical, state sharded."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simseg_tpu.core.optim import build_optimizer
from simseg_tpu.engine import TrainState, make_train_step
from simseg_tpu.engine.train_step import opt_state_sharding
from simseg_tpu.parallel import make_mesh, shard_batch
from simseg_tpu.utils.collections import AttrDict
from tests.test_models import tiny_clip
from tests.test_train_step import _batch, _cfg


def test_opt_state_sharding_spec():
    mesh = make_mesh()
    params = {"big": jnp.zeros((1024, 256)), "small": jnp.zeros((4,))}
    import optax

    tx = optax.adam(1e-3)
    state = tx.init(params)
    spec = opt_state_sharding(state, mesh, min_size=1024)
    leaves = jax.tree.leaves(spec)
    # at least one leaf sharded over 'data'
    assert any("data" in str(s.spec) for s in leaves)


@pytest.mark.slow
def test_zero1_matches_replicated():
    model = tiny_clip()
    batch = _batch(16)
    params = model.init(jax.random.key(0), batch)
    cfg = _cfg()
    cfg.optim.name = "torch.optim.SGD"
    cfg.optim.param = AttrDict(momentum=0.9)  # momentum -> real moment state
    mesh = make_mesh()
    sharded_batch = shard_batch(batch, mesh)

    tx1, set_lr1 = build_optimizer(cfg, params)
    s1 = TrainState.create(params, tx1)
    step1 = make_train_step(model, tx1, set_lr1, mesh=mesh, donate=False)

    tx2, set_lr2 = build_optimizer(cfg, params)
    s2 = TrainState.create(params, tx2)
    factory = make_train_step(model, tx2, set_lr2, mesh=mesh, donate=False,
                              shard_opt_state=True, opt_shard_min_size=512)
    step2, s2 = factory(s2)

    # some momentum leaf is actually sharded across devices
    mom_leaves = jax.tree.leaves(s2.opt_state)
    assert any(
        not x.sharding.is_fully_replicated
        for x in mom_leaves if hasattr(x, "sharding")
    )

    for _ in range(3):
        s1, m1 = step1(s1, sharded_batch, None, 1e-3)
        s2, m2 = step2(s2, sharded_batch, None, 1e-3)
    assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), rel=1e-5)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-6)


@pytest.mark.slow
def test_bsgs_zero1_matches_replicated():
    """BSGS factory form (shard_opt_state=True): numerics identical to the
    replicated BSGS step, moments actually sharded."""
    from simseg_tpu.engine.bsgs import make_bsgs_train_step

    model = tiny_clip()
    batch = _batch(16)
    params = model.init(jax.random.key(0), batch)
    cfg = _cfg()
    cfg.optim.name = "torch.optim.SGD"
    cfg.optim.param = AttrDict(momentum=0.9)
    mesh = make_mesh()
    sharded_batch = shard_batch(batch, mesh)

    tx1, set_lr1 = build_optimizer(cfg, params)
    s1 = TrainState.create(params, tx1)
    step1 = make_bsgs_train_step(model, tx1, set_lr1, num_micro=2, mesh=mesh,
                                 donate=False)

    tx2, set_lr2 = build_optimizer(cfg, params)
    factory = make_bsgs_train_step(model, tx2, set_lr2, num_micro=2,
                                   mesh=mesh, donate=False,
                                   shard_opt_state=True,
                                   opt_shard_min_size=512)
    step2, s2 = factory(TrainState.create(params, tx2))

    assert any(
        not x.sharding.is_fully_replicated
        for x in jax.tree.leaves(s2.opt_state) if hasattr(x, "sharding")
    )
    for _ in range(2):
        s1, m1 = step1(s1, sharded_batch, None, 1e-3)
        s2, m2 = step2(s2, sharded_batch, None, 1e-3)
    assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), rel=1e-5)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-6)
