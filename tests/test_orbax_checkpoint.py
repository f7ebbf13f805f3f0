"""Orbax checkpoint backend round-trip."""

import numpy as np
import optax
import pytest

from simseg_tpu.engine import TrainState

ocp = pytest.importorskip("orbax.checkpoint")

from simseg_tpu.checkpoint.native import (  # noqa: E402
    load_checkpoint_orbax,
    make_orbax_manager,
    save_checkpoint_orbax,
)


def test_orbax_roundtrip(tmp_path):
    params = {"w": np.arange(6, dtype=np.float32).reshape(2, 3)}
    tx = optax.adamw(1e-3)
    state = TrainState.create(params, tx)

    mgr = make_orbax_manager(str(tmp_path / "ck"), max_to_keep=2)
    save_checkpoint_orbax(mgr, 10, state, {"epoch": 1, "step": 10})
    save_checkpoint_orbax(mgr, 20, state, {"epoch": 2, "step": 20})
    mgr.wait_until_finished()
    assert mgr.latest_step() == 20

    restored, meta = load_checkpoint_orbax(mgr, state)
    assert meta["epoch"] == 2
    np.testing.assert_array_equal(np.asarray(restored.params["w"]), params["w"])

    restored10, meta10 = load_checkpoint_orbax(mgr, state, step=10)
    assert meta10["step"] == 10


def test_load_params_from_orbax_dir(tmp_path):
    """Params-only extraction from an orbax CheckpointManager directory
    (the path export/eval tools take for ckpt.backend='orbax' runs)."""
    import jax.numpy as jnp

    from simseg_tpu.checkpoint.native import load_params

    params = {"params": {"w": np.arange(6, dtype=np.float32).reshape(2, 3),
                         "b": np.ones((3,), np.float32)}}
    tx = optax.adamw(1e-3)
    state = TrainState.create(params, tx)
    mgr = make_orbax_manager(str(tmp_path / "ck"))
    save_checkpoint_orbax(mgr, 5, state, {"epoch": 1})
    mgr.wait_until_finished()

    template = {"params": {"w": jnp.zeros((2, 3)), "b": jnp.zeros((3,))}}
    restored = load_params(str(tmp_path / "ck"), template)
    np.testing.assert_array_equal(np.asarray(restored["params"]["w"]),
                                  params["params"]["w"])
    np.testing.assert_array_equal(np.asarray(restored["params"]["b"]),
                                  params["params"]["b"])
