"""Device mesh construction and sharding helpers.

TPU-native replacement for the reference's NCCL process-group layer
(``simseg/core/initial.py:52-54`` init_process_group and
``simseg/utils/dist.py:371-428`` generate_local_groups): instead of
host-aware NCCL subgroups we build a ``jax.sharding.Mesh`` whose axes encode
the same structure —

- ``data``: the pure data-parallel axis (gradients averaged by XLA).
- optional ``group`` sub-axis: when the contrastive loss should only share
  negatives within a subset of devices (reference ``cfg.loss.group_size``),
  the mesh is reshaped to ('replica', 'group') so the gather rides the
  fastest ICI links, exactly what generate_local_groups' hostname trick
  approximated on GPU clusters.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
REPLICA_AXIS = "replica"
MODEL_AXIS = "model"
PIPE_AXIS = "pipe"


def init_distributed() -> None:
    """Initialize multi-host JAX if launched under a pod runtime
    (parity: core/initial.py:52-54; here jax.distributed over ICI/DCN).

    Fails LOUDLY on a half-configured pod environment: if
    COORDINATOR_ADDRESS is set, initialization must succeed — silently
    degrading to single-process would train on 1/N of the data with no
    gradient exchange and corrupt the run."""
    addr = os.environ.get("COORDINATOR_ADDRESS")
    # NOTE: do not touch jax.process_count()/jax.devices() here — they
    # initialize the XLA backend, after which jax.distributed.initialize
    # refuses to run
    if not addr or jax.distributed.is_initialized():
        return  # single-host run, or already initialized by the runtime
    num = os.environ.get("NUM_PROCESSES")
    pid = os.environ.get("PROCESS_ID")
    try:
        if num is not None or pid is not None:
            if num is None or pid is None:
                raise ValueError(
                    "NUM_PROCESSES and PROCESS_ID must both be set "
                    f"(got NUM_PROCESSES={num!r}, PROCESS_ID={pid!r})"
                )
            jax.distributed.initialize(
                coordinator_address=addr,
                num_processes=int(num),
                process_id=int(pid),
            )
        else:
            # TPU pod runtime: topology autodetected
            jax.distributed.initialize(coordinator_address=addr)
    except Exception as e:
        raise RuntimeError(
            f"Multi-host init requested (COORDINATOR_ADDRESS={addr!r}) but "
            f"jax.distributed.initialize failed: {e}. Unset "
            "COORDINATOR_ADDRESS for single-host runs, or fix "
            "NUM_PROCESSES/PROCESS_ID."
        ) from e


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    group_size: int = -1,
    tp_size: int = 1,
    pp_size: int = 1,
) -> Mesh:
    """Build a 1-D data mesh, a ('replica', 'data') mesh when the
    contrastive gather is limited to groups of ``group_size`` devices, a
    (..., 'model') mesh when ``tp_size`` > 1 devices cooperate on each model
    replica (tensor parallelism, see parallel/tp.py), or a ('pipe', ...)
    mesh when ``pp_size`` > 1 stages pipeline the block stack
    (parallel/pp.py).

    With group_size <= 0 (reference default: gather over the world) the mesh
    is Mesh(devices, ('data',)). Otherwise devices are folded into
    (n_groups, group_size) with the gather axis innermost so the all-gather
    stays on the densest ICI links. The 'model' axis is always innermost —
    the per-block TP collectives (psum of row-parallel partials) are the
    most latency-sensitive traffic, so they get the densest links. The
    'pipe' axis is outermost: stages exchange one activation hop per
    microbatch tick, the least bandwidth-hungry traffic of the bunch.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    tp = int(tp_size) if tp_size and tp_size > 1 else 1
    pp = int(pp_size) if pp_size and pp_size > 1 else 1
    if tp > 1 and n % tp != 0:
        raise ValueError(f"tp_size {tp} must divide device count {n}")
    if pp > 1:
        if n % pp != 0:
            raise ValueError(f"pp_size {pp} must divide device count {n}")
        if tp > 1 or (group_size is not None and group_size > 0):
            raise NotImplementedError(
                "pp currently composes with data parallelism only "
                "(no tp/grouped mesh on top)")
        arr = np.array(devices).reshape(pp, n // pp)
        return Mesh(arr, (PIPE_AXIS, DATA_AXIS))
    n_data = n // tp
    if group_size is None or group_size <= 0 or group_size >= n_data:
        if tp == 1:
            return Mesh(np.array(devices), (DATA_AXIS,))
        arr = np.array(devices).reshape(n_data, tp)
        return Mesh(arr, (DATA_AXIS, MODEL_AXIS))
    if n_data % group_size != 0:
        raise ValueError(
            f"group_size {group_size} must divide data-parallel size {n_data}"
        )
    if tp == 1:
        arr = np.array(devices).reshape(n_data // group_size, group_size)
        return Mesh(arr, (REPLICA_AXIS, DATA_AXIS))
    arr = np.array(devices).reshape(n_data // group_size, group_size, tp)
    return Mesh(arr, (REPLICA_AXIS, DATA_AXIS, MODEL_AXIS))


def batch_axes(mesh: Mesh) -> tuple:
    """Mesh axes the batch dim is sharded over (every axis except 'model'
    and 'pipe' — each tensor-parallel group / pipeline stage works on the
    same examples)."""
    return tuple(ax for ax in mesh.axis_names
                 if ax not in (MODEL_AXIS, PIPE_AXIS))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over the data axes of the mesh."""
    return NamedSharding(mesh, P(batch_axes(mesh)))


def loss_group_samples(mesh: Mesh, batch_size: int) -> int:
    """Convert a grouped mesh into the loss-level samples-per-group.

    ``cfg.loss.group_size`` is in the reference's unit — DEVICES per
    contrastive gather group (clip_bsgs_runner.py:71-74,
    ``generate_local_groups(group_size)``). ``make_mesh`` consumes that
    unit; the fused-global-batch loss (``ops/losses.py info_nce``) needs
    the matching SAMPLES-per-group block. Batch rows shard contiguously in
    ('replica', 'data') order, so each device group owns one contiguous
    ``batch_size / n_groups`` block. Returns -1 (global negatives) when the
    mesh has no replica axis (group_size <= 0 or >= the data-parallel
    size — the reference's world-group default)."""
    n_groups = mesh.shape.get(REPLICA_AXIS, 1)
    if n_groups <= 1:
        return -1
    if batch_size % n_groups != 0:
        raise ValueError(
            f"batch_size {batch_size} must divide into {n_groups} device "
            f"groups")
    return batch_size // n_groups


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place a host pytree batch onto the mesh, batch-dim sharded.

    On a multi-process mesh the host batch is this process's shard (the
    loaders feed per-process slices, datasets.py _process_shard); the
    global array is assembled from the local blocks without any data
    movement between hosts. Single-process keeps the plain device_put
    (accepts device arrays as well as numpy)."""
    sharding = data_sharding(mesh)
    if any(d.process_index != jax.process_index()
           for d in mesh.devices.flat):
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)),
            batch,
        )
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def eval_mesh(mesh: Optional[Mesh], loader_batch) -> Optional[Mesh]:
    """Gate a mesh for sharded evaluation: returns the mesh when the
    compiled loader batch divides its batch shards, else None with a
    warning (single-device fallback). Shared by the standalone eval tools
    so their multi-chip behavior cannot diverge."""
    from simseg_tpu.utils.logger import logger

    if mesh is None:
        return None
    if jax.process_count() > 1:
        # the standalone tools shard their DATASETS per process (each
        # process runs independent local jits and the results are gathered
        # on the host at the end) — a global-mesh jit would both assume
        # replicated host inputs and deadlock on uneven shard batch counts
        logger.info(
            "multi-process eval: per-process shards on local devices "
            "(host gather at the end); not sharding over the global mesh")
        return None
    n = batch_shards(mesh)
    if not loader_batch or loader_batch % n != 0:
        logger.warning(
            f"batch_size_val {loader_batch} not divisible by the "
            f"{n}-way mesh; evaluating single-device")
        return None
    logger.info(f"Sharding eval batches over {mesh}")
    return mesh


def batch_shards(mesh: Mesh) -> int:
    """Number of ways the batch dim is split (product of data-axis sizes)."""
    n = 1
    for ax in batch_axes(mesh):
        n *= mesh.shape[ax]
    return n


def local_batch_size(global_batch_size: int, mesh: Mesh) -> int:
    n = batch_shards(mesh)
    if global_batch_size % n != 0:
        raise ValueError(
            f"global batch size {global_batch_size} not divisible by "
            f"batch shard count {n}"
        )
    return global_batch_size // n
