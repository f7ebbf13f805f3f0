"""BSGS gradient-equivalence: the two-pass micro-batched surrogate must
reproduce the exact full-batch symmetric InfoNCE gradients (SURVEY.md §7.6),
including the learnable temperature."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simseg_tpu.core.optim import build_optimizer
from simseg_tpu.engine import TrainState, clip_loss_fn, make_bsgs_grad_fn, make_bsgs_train_step
from simseg_tpu.parallel import make_mesh, shard_batch
from tests.test_models import tiny_clip
from tests.test_train_step import _batch, _cfg


@pytest.mark.slow
def test_bsgs_grads_match_direct_autodiff():
    model = tiny_clip()
    batch = _batch(16, seed=3)
    params = model.init(jax.random.key(0), batch)

    direct = jax.grad(
        lambda p: clip_loss_fn(model, p, batch, None)[0]
    )(params)

    for num_micro in (1, 2, 4):
        grads, metrics = jax.jit(make_bsgs_grad_fn(model, num_micro))(params, batch)
        for a, b in zip(jax.tree.leaves(direct), jax.tree.leaves(grads)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5
            )

    # loss value for logging matches the true loss
    true_loss, _ = clip_loss_fn(model, params, batch, None)
    assert float(metrics["loss"]) == pytest.approx(float(true_loss), rel=1e-5)


@pytest.mark.slow
def test_bsgs_temperature_gradient_exact():
    model = tiny_clip(temperature_init=0.07)
    batch = _batch(8, seed=4)
    params = model.init(jax.random.key(0), batch)

    direct = jax.grad(lambda p: clip_loss_fn(model, p, batch, None)[0])(params)
    grads, _ = jax.jit(make_bsgs_grad_fn(model, 2))(params, batch)

    d_t = direct["params"]["temperature"]
    g_t = grads["params"]["temperature"]
    assert float(g_t) == pytest.approx(float(d_t), rel=1e-4)


def test_bsgs_with_smoothing_matches_direct():
    model = tiny_clip()
    batch = _batch(8, seed=5)
    params = model.init(jax.random.key(0), batch)
    direct = jax.grad(
        lambda p: clip_loss_fn(model, p, batch, None, smoothing=0.1)[0]
    )(params)
    grads, _ = jax.jit(make_bsgs_grad_fn(model, 2, smoothing=0.1))(params, batch)
    for a, b in zip(jax.tree.leaves(direct), jax.tree.leaves(grads)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5)


@pytest.mark.slow
def test_bsgs_deterministic_dropout_reforward():
    """Pass 2 must see the same dropout as pass 1 (the reference's
    stable_random re-seed, clip_bsgs_runner.py:310-312/:401-402) — grads are
    finite and reproducible with the same key."""
    model = tiny_clip(dropout=0.3)
    batch = _batch(8, seed=6)
    params = model.init(jax.random.key(0), batch)
    fn = jax.jit(make_bsgs_grad_fn(model, 2))
    g1, _ = fn(params, batch, jax.random.key(7))
    g2, _ = fn(params, batch, jax.random.key(7))
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
        assert np.all(np.isfinite(np.asarray(a)))


def test_bsgs_with_ignore_mask_matches_direct():
    """BSGS masked gradients (the D-sandwich left matrices) must equal
    autodiff of the masked NCE objective — a capability beyond the
    reference's BSGS (its plain NCE has ignore_mask, BSGS does not)."""
    model = tiny_clip()
    batch = _batch(8, seed=10)
    batch = dict(batch)
    batch["ignore_mask"] = jnp.asarray(
        np.array([0, 1, 0, 0, 1, 0, 0, 0], np.float32))
    params = model.init(jax.random.key(0), batch)
    direct = jax.grad(
        lambda p: clip_loss_fn(model, p, batch, None)[0]
    )(params)
    grads, metrics = jax.jit(make_bsgs_grad_fn(model, 2))(params, batch)
    for a, b in zip(jax.tree.leaves(direct), jax.tree.leaves(grads)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-5)
    true_loss, _ = clip_loss_fn(model, params, batch, None)
    assert float(metrics["loss"]) == pytest.approx(float(true_loss), rel=1e-5)


def test_bsgs_with_group_size_matches_direct():
    """Group-limited negatives (the reference's all_gather_group subgroups,
    clip_bsgs_runner.py:354-356) as block-diagonal analytic gradients."""
    model = tiny_clip()
    batch = _batch(8, seed=11)
    params = model.init(jax.random.key(0), batch)
    direct = jax.grad(
        lambda p: clip_loss_fn(model, p, batch, None, group_size=4)[0]
    )(params)
    grads, metrics = jax.jit(
        make_bsgs_grad_fn(model, 2, group_size=4))(params, batch)
    for a, b in zip(jax.tree.leaves(direct), jax.tree.leaves(grads)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-5)
    true_loss, _ = clip_loss_fn(model, params, batch, None, group_size=4)
    assert float(metrics["loss"]) == pytest.approx(float(true_loss), rel=1e-5)


@pytest.mark.slow
def test_bsgs_with_mixup_matches_direct():
    """Mixup-aware soft targets (clip_bsgs_runner.py:371-376): images mixed
    with the reversed pairing within each micro-batch, Y = lam*I +
    (1-lam)*block_flip. Autodiff target rebuilt with the same convention."""
    from simseg_tpu.ops.losses import mixup_nce

    model = tiny_clip()
    num_micro, b = 2, 8
    mb = b // num_micro
    batch = _batch(b, seed=12)
    params = model.init(jax.random.key(0), batch)
    from simseg_tpu.engine.train_step import mixup_lambda

    rng = jax.random.key(13)
    lam = float(mixup_lambda(rng, None, 0.2))

    def direct_loss(p):
        img = batch["image"].reshape(num_micro, mb, *batch["image"].shape[1:])
        flipped = img[:, ::-1].reshape(batch["image"].shape)
        mixed = dict(batch)
        mixed["image"] = lam * batch["image"] + (1.0 - lam) * flipped
        i_emb, t_emb, temp = model.apply(p, mixed, deterministic=True)
        i_emb = i_emb.astype(jnp.float32)
        t_emb = t_emb.astype(jnp.float32)
        i2t, _ = mixup_nce(i_emb, t_emb, temp, lam, flip_block=mb)
        t2i, _ = mixup_nce(t_emb, i_emb, temp, lam, flip_block=mb)
        return 0.5 * (i2t + t2i)

    direct = jax.grad(direct_loss)(params)
    grads, metrics = jax.jit(
        make_bsgs_grad_fn(model, num_micro, mixup=True,
                          mixup_alpha_param=0.2)
    )(params, batch, rng)
    for a, b_ in zip(jax.tree.leaves(direct), jax.tree.leaves(grads)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-3, atol=1e-5)
    assert float(metrics["loss"]) == pytest.approx(float(direct_loss(params)),
                                                   rel=1e-4)


def test_bsgs_combined_mask_group_smoothing_matches_direct():
    model = tiny_clip(temperature_init=0.07)
    batch = _batch(8, seed=14)
    batch = dict(batch)
    batch["ignore_mask"] = jnp.asarray(
        np.array([0, 0, 1, 0, 0, 0, 0, 1], np.float32))
    params = model.init(jax.random.key(0), batch)
    direct = jax.grad(
        lambda p: clip_loss_fn(model, p, batch, None, smoothing=0.1,
                               group_size=4)[0]
    )(params)
    grads, _ = jax.jit(
        make_bsgs_grad_fn(model, 2, smoothing=0.1, group_size=4)
    )(params, batch)
    for a, b in zip(jax.tree.leaves(direct), jax.tree.leaves(grads)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-5)


@pytest.mark.slow
def test_bsgs_train_step_on_mesh():
    model = tiny_clip()
    batch = _batch(16, seed=8)
    params = model.init(jax.random.key(0), batch)
    tx, set_lr = build_optimizer(_cfg(), params)
    state = TrainState.create(params, tx)
    mesh = make_mesh()
    step = make_bsgs_train_step(model, tx, set_lr, num_micro=2, mesh=mesh,
                                donate=False)
    sharded = shard_batch(batch, mesh)
    losses = []
    for _ in range(4):
        state, m = step(state, sharded, None, 1e-3)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]


@pytest.mark.slow
def test_bsgs_grads_match_direct_on_tp_mesh():
    """BSGS x tensor parallelism: the two scanned passes run with the
    Megatron param shardings (parallel/tp.py) and must still produce the
    exact full-batch gradients — the analytic middle section is
    sharding-agnostic global algebra."""
    from simseg_tpu.parallel.tp import tp_shardings

    model = tiny_clip()
    batch = _batch(16, seed=15)
    params = model.init(jax.random.key(0), batch)
    direct = jax.grad(lambda p: clip_loss_fn(model, p, batch, None)[0])(params)
    true_loss, _ = clip_loss_fn(model, params, batch, None)

    mesh = make_mesh(tp_size=2)
    placed = jax.device_put(params, tp_shardings(params, mesh))
    sharded = shard_batch(batch, mesh)
    grads, metrics = jax.jit(make_bsgs_grad_fn(model, 2))(placed, sharded)
    for a, b in zip(jax.tree.leaves(direct), jax.tree.leaves(grads)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-5)
    # same loss value as the unsharded/dp evaluation
    assert float(metrics["loss"]) == pytest.approx(float(true_loss), rel=1e-4)


@pytest.mark.parametrize("knobs", [
    dict(tp_size=2),                          # TP
    dict(tp_size=2, zero1=True),              # TP + ZeRO-1 moments
    dict(fsdp=True),                          # ZeRO-3 params
])
def test_bsgs_train_step_factory_on_sharded_towers(knobs):
    """The factory form places the state with TP/FSDP/ZeRO-1 shardings and
    the BSGS step trains (loss decreases) — the flagship big-batch x
    big-model composition."""
    knobs = dict(knobs)
    tp_size = knobs.pop("tp_size", 1)
    zero1 = knobs.pop("zero1", False)
    fsdp = knobs.pop("fsdp", False)

    model = tiny_clip()
    batch = _batch(16, seed=16)
    params = model.init(jax.random.key(0), batch)
    tx, set_lr = build_optimizer(_cfg(), params)
    state = TrainState.create(params, tx)
    mesh = make_mesh(tp_size=tp_size)
    factory = make_bsgs_train_step(model, tx, set_lr, num_micro=2, mesh=mesh,
                                   donate=False, shard_opt_state=zero1,
                                   fsdp=fsdp, fsdp_min_size=256)
    step, placed = factory(state)
    sharded = shard_batch(batch, mesh)
    losses = []
    for _ in range(4):
        placed, m = step(placed, sharded, None, 1e-3)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]
    if fsdp:
        # the tiny towers' largest kernels really are ZeRO-3-split
        from simseg_tpu.parallel.mesh import DATA_AXIS

        specs = [str(p.sharding.spec)
                 for p in jax.tree.leaves(placed.params)]
        assert any(DATA_AXIS in s for s in specs), specs
    if tp_size > 1:
        # qkv kernels really are sharded over 'model'
        from simseg_tpu.parallel.mesh import MODEL_AXIS

        qkv = placed.params["params"]["image_encoder"]["blocks_0"]["attn"]["qkv"]["kernel"]
        assert MODEL_AXIS in str(qkv.sharding.spec)


def test_bsgs_with_token_merging_matches_direct():
    """ToMe merge choices are deterministic in (params, data), so BSGS's
    re-forward reproduces the first pass's merges exactly and the two-pass
    surrogate still matches direct autodiff (ops/tome.py)."""
    model = tiny_clip(image_arch=(("tome_r", 2),))
    batch = _batch(16, seed=5)
    params = model.init(jax.random.key(0), batch)

    direct = jax.grad(
        lambda p: clip_loss_fn(model, p, batch, None)[0]
    )(params)
    grads, metrics = jax.jit(make_bsgs_grad_fn(model, 4))(params, batch)
    for a, b in zip(jax.tree.leaves(direct), jax.tree.leaves(grads)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5
        )


def test_bsgs_with_mixup_and_group_matches_direct():
    """Mixup + group-limited negatives together: the BSGS analytic path and
    clip-side mixup_nce(group_size=...) are independent implementations of
    the same objective, so their gradients must agree (code-review finding:
    the plain runner used to silently drop group_size under MixUpNCE)."""
    from simseg_tpu.engine.train_step import mixup_lambda
    from simseg_tpu.ops.losses import mixup_nce

    model = tiny_clip()
    num_micro, b, gs = 2, 8, 4
    mb = b // num_micro
    batch = _batch(b, seed=21)
    params = model.init(jax.random.key(0), batch)
    rng = jax.random.key(22)
    lam = float(mixup_lambda(rng, None, 0.2))

    def direct_loss(p):
        img = batch["image"].reshape(num_micro, mb, *batch["image"].shape[1:])
        flipped = img[:, ::-1].reshape(batch["image"].shape)
        mixed = dict(batch)
        mixed["image"] = lam * batch["image"] + (1.0 - lam) * flipped
        i_emb, t_emb, temp = model.apply(p, mixed, deterministic=True)
        i_emb = i_emb.astype(jnp.float32)
        t_emb = t_emb.astype(jnp.float32)
        i2t, _ = mixup_nce(i_emb, t_emb, temp, lam, flip_block=mb,
                           group_size=gs)
        t2i, _ = mixup_nce(t_emb, i_emb, temp, lam, flip_block=mb,
                           group_size=gs)
        return 0.5 * (i2t + t2i)

    direct = jax.grad(direct_loss)(params)
    grads, metrics = jax.jit(
        make_bsgs_grad_fn(model, num_micro, group_size=gs, mixup=True,
                          mixup_alpha_param=0.2)
    )(params, batch, rng)
    for a, b_ in zip(jax.tree.leaves(direct), jax.tree.leaves(grads)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-3, atol=1e-5)
    assert float(metrics["loss"]) == pytest.approx(float(direct_loss(params)),
                                                   rel=1e-4)
