"""Native checkpoint save/restore with step metadata and auto-resume.

Parity: reference ``simseg/core/hooks/checkpoint.py`` — step checkpoints
every ``ckpt.step_interval`` (:90-95), per-epoch + latest checkpoints
(:97-108), auto-resume restoring model/optimizer/epoch/step/inner_step/
wandb_id (:142-182), plus a config snapshot dump (:69-77).

Format: a directory per checkpoint holding the TrainState serialized with
flax msgpack (params + optimizer state + step) and a ``meta.json``
(timestamps, versions, epoch/step/inner_step, wandb id). Writes go through a
temp file + atomic rename so an interrupted save never corrupts the resume
point. Only process 0 writes; on restore every process reads the same file
(parameters are replicated).
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Optional, Tuple

import jax
from flax import serialization

from simseg_tpu.utils.logger import logger

STATE_FILE = "train_state.msgpack"
META_FILE = "meta.json"
LATEST = "latest_ckpt"


def _is_proc0() -> bool:
    try:
        return jax.process_index() == 0
    except Exception:
        return True


def save_checkpoint(
    directory: str,
    name: str,
    state,
    meta: Optional[Dict[str, Any]] = None,
    make_latest: bool = True,
) -> Optional[str]:
    """Serialize ``state`` under ``directory/name``; returns the path.

    Crash consistency: state and meta describe one training instant, so
    they must become the resume point as a PAIR. Fresh names (epoch saves,
    first step save) get both files written BEFORE the ``latest_ckpt``
    pointer flips — a kill mid-save leaves the pointer on the previous
    complete checkpoint. Re-saves under an existing name (the constant
    step-interval filename) cannot atomically replace two files in place,
    so they write a fresh ``name@<step>`` versioned dir and flip the
    pointer to it, then prune superseded versions; resume always follows
    the pointer (auto-resume, ``load_params``)."""
    if not _is_proc0():
        return None
    base = name
    path = os.path.join(directory, name)
    meta = dict(meta or {})
    if make_latest and os.path.exists(os.path.join(path, STATE_FILE)):
        name = f"{name}@{meta.get('step', int(time.time() * 1000))}"
        path = os.path.join(directory, name)
        if os.path.exists(os.path.join(path, STATE_FILE)):
            # same step re-saved (e.g. preemption right after an interval
            # save): fall back to the timestamp suffix to stay fresh
            name = f"{base}@{int(time.time() * 1000)}"
            path = os.path.join(directory, name)
    os.makedirs(path, exist_ok=True)

    meta.setdefault("time", time.strftime("%Y-%m-%d %H:%M:%S"))
    meta.setdefault("simseg_tpu_version", _version())
    meta.setdefault("jax_version", jax.__version__)

    host_state = jax.device_get(state)
    blob = serialization.to_bytes(host_state)
    tmp = os.path.join(path, STATE_FILE + ".tmp")
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, os.path.join(path, STATE_FILE))
    tmp_meta = os.path.join(path, META_FILE + ".tmp")
    with open(tmp_meta, "w") as f:
        json.dump(meta, f, indent=2)
    os.replace(tmp_meta, os.path.join(path, META_FILE))

    if make_latest:
        link = os.path.join(directory, LATEST)
        tmp_link = link + ".tmp"
        with open(tmp_link, "w") as f:
            f.write(name)
        os.replace(tmp_link, link)
        # prune superseded versions of this name (no-op for unique names:
        # nothing else matches base/base@*)
        _prune_versions(directory, base, keep=name)
    logger.info(f"Saved checkpoint {path}")
    return path


def _prune_versions(directory: str, base: str, keep: str) -> None:
    """Remove superseded ``base`` / ``base@*`` step-checkpoint dirs after
    the pointer has flipped to ``keep``."""
    import shutil

    for entry in os.listdir(directory):
        if entry == keep or not (entry == base
                                 or entry.startswith(base + "@")):
            continue
        shutil.rmtree(os.path.join(directory, entry), ignore_errors=True)


def load_checkpoint(
    directory: str,
    state,
    name: Optional[str] = None,
) -> Tuple[Any, Dict[str, Any]]:
    """Restore into the structure of ``state``; returns (state, meta).
    With name=None, follows the ``latest_ckpt`` pointer."""
    if name is None:
        link = os.path.join(directory, LATEST)
        with open(link) as f:
            name = f.read().strip()
    path = os.path.join(directory, name)
    with open(os.path.join(path, STATE_FILE), "rb") as f:
        blob = f.read()
    restored = serialization.from_bytes(jax.device_get(state), blob)
    meta: Dict[str, Any] = {}
    meta_path = os.path.join(path, META_FILE)
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    logger.info(f"Loaded checkpoint {path} (meta: epoch={meta.get('epoch')}, "
                f"step={meta.get('step')})")
    return restored, meta


def load_params(path: str, params_template):
    """Load only the model parameters from a native checkpoint.

    ``path`` may be a concrete msgpack checkpoint directory (holding
    ``train_state.msgpack``), a ``ckpt.dir``-style parent with a
    ``latest_ckpt`` pointer, or an orbax CheckpointManager directory
    (``cfg.ckpt.backend='orbax'`` runs — numeric step dirs). Used where no
    optimizer state is wanted — serving export (tools/export_serving.py)
    and external pretrained init."""
    if (os.path.isdir(path)
            and not os.path.exists(os.path.join(path, STATE_FILE))):
        link = os.path.join(path, LATEST)
        if not os.path.exists(link) and _looks_like_orbax_dir(path):
            return _load_params_orbax(path, params_template)
        with open(link) as f:
            path = os.path.join(path, f.read().strip())
    with open(os.path.join(path, STATE_FILE), "rb") as f:
        raw = serialization.msgpack_restore(f.read())
    return serialization.from_state_dict(
        jax.device_get(params_template), raw["params"])


def _looks_like_orbax_dir(path: str) -> bool:
    return any(name.isdigit() for name in os.listdir(path))


def _load_params_orbax(path: str, params_template):
    """Params-only restore from an orbax CheckpointManager directory: the
    raw 'state' item is read without a TrainState template (we have only
    the param tree) and the params subtree coerced onto the template."""
    import orbax.checkpoint as ocp

    mgr = make_orbax_manager(path)
    step = mgr.latest_step()
    if step is None:
        raise FileNotFoundError(f"no orbax checkpoints under {path}")
    restored = mgr.restore(step, args=ocp.args.Composite(
        state=ocp.args.StandardRestore()))
    return serialization.from_state_dict(
        jax.device_get(params_template), restored["state"]["params"])


def has_checkpoint(directory: str) -> bool:
    link = os.path.join(directory, LATEST)
    if not os.path.exists(link):
        return False
    with open(link) as f:
        name = f.read().strip()
    return os.path.exists(os.path.join(directory, name, STATE_FILE))


# --------------------------------------------------------------------------
# orbax backend (pod-scale: multihost-coordinated, async-capable, retention)
# --------------------------------------------------------------------------

def make_orbax_manager(directory: str, max_to_keep: int = 3):
    """CheckpointManager for sharded/multihost checkpoints. The msgpack
    functions above are the single-host default; orbax adds multihost
    coordination and async saves for pod training."""
    import orbax.checkpoint as ocp

    return ocp.CheckpointManager(
        os.path.abspath(directory),
        options=ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep,
            create=True,
            enable_async_checkpointing=True,
        ),
    )


def save_checkpoint_orbax(manager, step: int, state, meta: Optional[Dict[str, Any]] = None) -> None:
    """Async save: the device arrays are handed to orbax directly. Orbax's
    blocking phase is the device-to-host snapshot (so donated buffers from
    the next train step can never corrupt the checkpoint); the storage
    write then drains on its background thread. Handing over the arrays
    (rather than a pre-pulled jax.device_get copy) avoids a duplicate host
    copy and lets orbax fetch per-array. ``manager.wait_until_finished()``
    (CheckpointHook.after_run / load) joins the writer before exit or
    restore."""
    import orbax.checkpoint as ocp

    if step in manager.all_steps():
        # Orbax keys checkpoints by step and refuses duplicates (measured on
        # 0.11.32: a non-forced re-save is SILENTLY skipped; force=True
        # raises StepAlreadyExistsError). An epoch-end save lands on the
        # same step as a coinciding interval save (and PreemptionHook can
        # too), and the LATER save carries the more advanced meta
        # (epoch+1 / inner_step 0) — so replace instead of silently keeping
        # the stale meta: join the async writer, drop the step, save fresh.
        manager.wait_until_finished()
        manager.delete(step)
    manager.save(
        step,
        args=ocp.args.Composite(
            state=ocp.args.StandardSave(state),
            meta=ocp.args.JsonSave(dict(meta or {})),
        ),
    )


def _abstract_template(state):
    """Restore template from shapes/dtypes/shardings WITHOUT pulling the
    live state to the host: jax.device_get on a multihost-sharded
    (ZeRO-1/FSDP/TP pod) TrainState raises (non-addressable devices) and
    would double host memory even where it works. Abstract jax.Array
    leaves keep their shardings so orbax restores straight into the
    sharded layout; non-array leaves (python scalars in opt-state
    hyperparams) pass through concrete."""
    def leaf(x):
        if isinstance(x, jax.Array):
            return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding)
        return x

    return jax.tree.map(leaf, state)


def load_checkpoint_orbax(manager, state, step: Optional[int] = None):
    import orbax.checkpoint as ocp

    manager.wait_until_finished()  # join any in-flight async save first
    step = manager.latest_step() if step is None else step
    restored = manager.restore(
        step,
        args=ocp.args.Composite(
            state=ocp.args.StandardRestore(_abstract_template(state)),
            meta=ocp.args.JsonRestore(),
        ),
    )
    return restored["state"], dict(restored["meta"] or {})


def dump_config_snapshot(directory: str, cfg) -> None:
    """parity: checkpoint.py:69-77 (global.yaml snapshot)."""
    if not _is_proc0():
        return
    import yaml

    os.makedirs(directory, exist_ok=True)
    with open(os.path.join(directory, "global.yaml"), "w") as f:
        yaml.safe_dump(cfg.to_dict(), f, default_flow_style=False)


def _version() -> str:
    try:
        from simseg_tpu import __version__
        return __version__
    except Exception:
        return "unknown"
