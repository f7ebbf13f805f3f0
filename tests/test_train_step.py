import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simseg_tpu.core.optim import build_optimizer
from simseg_tpu.engine import TrainState, clip_loss_fn, make_eval_step, make_train_step
from simseg_tpu.parallel import make_mesh, shard_batch
from simseg_tpu.utils.collections import AttrDict
from tests.test_models import tiny_clip


def _cfg():
    cfg = AttrDict()
    cfg.optim = AttrDict()
    cfg.optim.name = "torch.optim.AdamW"
    cfg.optim.param = AttrDict(betas=(0.9, 0.98), eps=1e-6, weight_decay=0.001)
    cfg.optim.param_group_rules = AttrDict()
    cfg.optim.grad_clip = AttrDict()
    return cfg


def _batch(n=16, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "image": jnp.asarray(rng.normal(size=(n, 32, 32, 3)).astype(np.float32)),
        "input_ids": jnp.asarray(rng.integers(0, 128, (n, 12))),
        "attention_mask": jnp.asarray(np.ones((n, 12), dtype=np.int32)),
    }


def test_train_step_decreases_loss():
    model = tiny_clip()
    batch = _batch()
    params = model.init(jax.random.key(0), batch)
    tx, set_lr = build_optimizer(_cfg(), params)
    state = TrainState.create(params, tx)
    step = make_train_step(model, tx, set_lr, donate=False)

    losses = []
    for i in range(8):
        state, metrics = step(state, batch, None, 1e-3)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0]
    assert int(state.step) == 8
    assert np.isfinite(losses).all()


@pytest.mark.slow
def test_train_step_on_mesh_matches_single_device():
    """The pjit data-parallel step must produce the same numerics as the
    single-device step (XLA inserts the gather/reduce from shardings)."""
    model = tiny_clip()
    batch = _batch()
    params = model.init(jax.random.key(0), batch)
    # SGD: linear in the gradient, so numerics compare exactly. (Adam would
    # amplify the noise on exactly-zero-gradient leaves like attention key
    # biases to full lr scale.)
    cfg = _cfg()
    cfg.optim.name = "torch.optim.SGD"
    cfg.optim.param = AttrDict(momentum=0.0)

    tx1, set_lr1 = build_optimizer(cfg, params)
    s1 = TrainState.create(params, tx1)
    step1 = make_train_step(model, tx1, set_lr1, donate=False)

    mesh = make_mesh()
    tx2, set_lr2 = build_optimizer(cfg, params)
    s2 = TrainState.create(params, tx2)
    step2 = make_train_step(model, tx2, set_lr2, mesh=mesh, donate=False)
    sharded = shard_batch(batch, mesh)

    for _ in range(3):
        s1, m1 = step1(s1, batch, None, 1e-3)
        s2, m2 = step2(s2, sharded, None, 1e-3)

    assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), rel=1e-4)
    l1 = jax.tree.leaves(s1.params)
    l2 = jax.tree.leaves(s2.params)
    for a, b in zip(l1, l2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6)


def test_eval_step_shapes():
    model = tiny_clip()
    batch = _batch(8)
    params = model.init(jax.random.key(0), batch)
    mesh = make_mesh()
    eval_step = make_eval_step(model, mesh)
    img, txt = eval_step(params, shard_batch(batch, mesh))
    assert img.shape == (8, 16) and txt.shape == (8, 16)


def test_dropout_rng_changes_loss():
    model = tiny_clip(dropout=0.2)
    batch = _batch(8)
    params = model.init(jax.random.key(0), batch)
    l1, _ = clip_loss_fn(model, params, batch, jax.random.key(1))
    l2, _ = clip_loss_fn(model, params, batch, jax.random.key(2))
    l1d, _ = clip_loss_fn(model, params, batch, jax.random.key(1))
    assert float(l1) != float(l2)
    assert float(l1) == pytest.approx(float(l1d))  # explicit keys = stable_random
