"""Collective wrappers under shard_map, ENV context, misc helpers."""

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

from simseg_tpu.ops.grad_rev import grad_reverse
from simseg_tpu.parallel import make_mesh
from simseg_tpu.parallel.collectives import (
    all_gather,
    all_reduce_mean,
    all_reduce_sum,
    axis_index,
    barrier,
    broadcast_object,
)
from simseg_tpu.utils.context import ENV, root_only
from simseg_tpu.utils.misc import AverageMeter, split_list_evenly


def test_collectives_under_shard_map():
    mesh = make_mesh()
    x = jnp.arange(16.0).reshape(16, 1)

    def fn(shard):
        g = all_gather(shard)          # (16, 1) on every shard
        s = all_reduce_sum(jnp.sum(shard))
        m = all_reduce_mean(jnp.sum(shard))
        idx = axis_index()
        return g, s * jnp.ones((2, 1)), m * jnp.ones((2, 1)), idx * jnp.ones((2, 1))

    g, s, m, idx = jax.jit(
        shard_map(
            fn, mesh=mesh, in_specs=P("data"),
            out_specs=(P(None), P("data"), P("data"), P("data")),
            check_vma=False,
        )
    )(x)
    np.testing.assert_allclose(np.asarray(g), np.arange(16.0).reshape(16, 1))
    np.testing.assert_allclose(np.asarray(s)[0], np.sum(np.arange(16.0)))
    np.testing.assert_allclose(np.asarray(m)[0], np.sum(np.arange(16.0)) / 8)
    np.testing.assert_allclose(np.unique(np.asarray(idx)), np.arange(8.0))


def test_gather_is_differentiable():
    """parity: GatherLayer — gradient flows through the gather."""
    mesh = make_mesh()
    x = jnp.arange(8.0)

    def loss(x):
        def fn(shard):
            g = all_gather(shard)
            return jnp.sum(g * g) * jnp.ones_like(shard)

        y = shard_map(fn, mesh=mesh, in_specs=P("data"), out_specs=P("data"))(x)
        return y[0]

    grads = jax.grad(loss)(x)
    np.testing.assert_allclose(np.asarray(grads), 2.0 * np.arange(8.0))


def test_host_collectives_single_process():
    assert broadcast_object({"a": 1}) == {"a": 1}
    barrier()  # no-op single process


def test_env_context():
    assert ENV.rank == 0 and ENV.size == 1 and ENV.is_root
    assert ENV.device_count == 8
    calls = []

    @root_only
    def record(x):
        calls.append(x)
        return x

    assert record(5) == 5
    assert calls == [5]


def test_local_root_only_runs_on_every_process(monkeypatch):
    # With one process per TPU host, every process is its host's local root:
    # local_root_only must pass even when the GLOBAL rank is nonzero
    # (reference gates to local_rank == 0, i.e. once per node — NOT once
    # per job), while root_only keeps gating to the global root.
    from simseg_tpu.utils.context import GlobalContext, local_root_only

    monkeypatch.setattr(GlobalContext, "rank", property(lambda self: 3))
    assert not ENV.is_root

    ran = []

    @local_root_only
    def local_work():
        ran.append("local")

    @root_only
    def root_work():
        ran.append("root")

    local_work()
    root_work()
    assert ran == ["local"]


def test_grad_reverse():
    g = jax.grad(lambda x: jnp.sum(grad_reverse(x, 2.0)))(jnp.ones(3))
    np.testing.assert_allclose(np.asarray(g), -2.0)


def test_staged_stream_prefetch_semantics():
    """The train loop's device staging (cfg.data.device_prefetch): batches
    are prepared ahead of consumption (up to `size` in flight), each exactly
    once, yielded in order with their prepared form."""
    from simseg_tpu.core.runner import EpochRunner

    prepared = []

    class Host:
        def _prepare_batch(self, b):
            prepared.append(b)
            return ("dev", b)

    pairs = [(i, f"b{i}") for i in range(5)]
    stream = EpochRunner._staged_stream(Host(), iter(pairs), 2)
    seen = []
    for i, batch, device_batch in stream:
        # when step i is consumed, steps up to i+2 are already staged
        assert len(prepared) >= min(i + 2, 5)
        assert len(prepared) <= min(i + 3, 5)
        assert device_batch == ("dev", batch)
        seen.append((i, batch))
    assert seen == pairs
    assert prepared == [b for _, b in pairs]


def test_misc_helpers():
    m = AverageMeter("loss")
    m.update(1.0)
    m.update(3.0)
    assert m.avg == 2.0 and m.count == 2
    chunks = split_list_evenly(list(range(10)), 3)
    assert [len(c) for c in chunks] == [4, 3, 3]
    assert sum(chunks, []) == list(range(10))
