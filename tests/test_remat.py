"""Activation rematerialization: identical gradients, lower memory."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simseg_tpu.engine import clip_loss_fn
from simseg_tpu.models import CLIPModel


def _model(remat):
    return CLIPModel(
        image_tag="vit_test", img_size=32, text_tag="bert_test",
        projection_name="simple", projection_dim=16, pool_name="loda",
        image_k=3, text_k=1, temperature_name="parameter",
        temperature_init=0.02, remat=remat,
    )


@pytest.mark.slow
def test_remat_gradients_identical():
    rng = np.random.default_rng(0)
    batch = {
        "image": jnp.asarray(rng.normal(size=(4, 32, 32, 3)).astype(np.float32)),
        "input_ids": jnp.asarray(rng.integers(0, 128, (4, 10))),
        "attention_mask": jnp.ones((4, 10), jnp.int32),
    }
    m0, m1 = _model(False), _model(True)
    params = m0.init(jax.random.key(0), batch)
    g0 = jax.grad(lambda p: clip_loss_fn(m0, p, batch, None)[0])(params)
    g1 = jax.grad(lambda p: clip_loss_fn(m1, p, batch, None)[0])(params)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)


def test_remat_policy_dots_gradients_identical():
    """remat_policy='dots' (save matmul outputs, recompute elementwise) must
    be numerically identical to plain remat and no-remat."""
    from tests.test_models import tiny_clip
    from simseg_tpu.engine import clip_loss_fn

    batch = {
        "image": jnp.asarray(np.random.default_rng(0).normal(
            size=(4, 32, 32, 3)).astype(np.float32)),
        "input_ids": jnp.asarray(np.random.default_rng(1).integers(
            0, 128, (4, 10)).astype(np.int32)),
        "attention_mask": jnp.ones((4, 10), jnp.int32),
    }
    base = tiny_clip()
    params = base.init(jax.random.key(0), batch)
    g0 = jax.grad(lambda p: clip_loss_fn(base, p, batch, None)[0])(params)
    dots = tiny_clip(remat=True, remat_policy="dots")
    g1 = jax.grad(lambda p: clip_loss_fn(dots, p, batch, None)[0])(params)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)
