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


def test_orbax_duplicate_step_replaces_meta(tmp_path):
    """An epoch-end save can land on the same step as an interval save;
    orbax keys by step (a non-forced duplicate is silently skipped), so
    save_checkpoint_orbax must REPLACE the step so the later save's more
    advanced meta (epoch+1, inner_step 0) becomes the resume point."""
    params = {"w": np.arange(4, dtype=np.float32)}
    state = TrainState.create(params, optax.sgd(0.1))
    mgr = make_orbax_manager(str(tmp_path / "ck"))

    save_checkpoint_orbax(mgr, 7, state, {"epoch": 3, "inner_step": 2000})
    save_checkpoint_orbax(mgr, 7, state, {"epoch": 4, "inner_step": 0})
    mgr.wait_until_finished()

    _, meta = load_checkpoint_orbax(mgr, state)
    assert meta["epoch"] == 4 and meta["inner_step"] == 0


def test_orbax_restore_preserves_shardings(tmp_path):
    """The restore template is built from abstract shapes + shardings, not
    jax.device_get (which raises on multihost-sharded pod states): restored
    leaves must come back as jax.Arrays carrying the live state's
    shardings."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from simseg_tpu.parallel import make_mesh

    mesh = make_mesh()
    sharded = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    params = {
        "w": jax.device_put(jnp.arange(16, dtype=jnp.float32), sharded),
        "b": jax.device_put(jnp.ones((3,), jnp.float32), repl),
    }
    state = TrainState.create(params, optax.sgd(0.1))
    mgr = make_orbax_manager(str(tmp_path / "ck"))
    save_checkpoint_orbax(mgr, 1, state, {"epoch": 1})
    mgr.wait_until_finished()

    restored, _ = load_checkpoint_orbax(mgr, state)
    assert restored.params["w"].sharding == sharded
    assert restored.params["b"].sharding == repl
    np.testing.assert_array_equal(np.asarray(restored.params["w"]),
                                  np.arange(16, dtype=np.float32))
