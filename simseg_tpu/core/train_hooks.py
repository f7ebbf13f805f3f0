"""Standard training hooks: logging, checkpointing, retrieval eval, wandb.

Parity:
- LogHook: reference ``core/hooks/log.py:64-146`` — per-interval train line
  with metric means + step time, epoch summaries.
- CheckpointHook: ``core/hooks/checkpoint.py:80-187`` — step-interval +
  per-epoch + latest checkpoints, auto-resume (incl. mid-epoch inner_step),
  external pretrained fallback via the torch bridge.
- RetrievalEvalHook: ``tasks/clip/hooks/eval.py:9-99`` — collects
  embeddings during validation, computes R@1/5/10 + RSUM at epoch end.
- WandbHook: ``core/hooks/wandb_hook.py:10-81`` — resumable run id stored in
  checkpoint meta; interval-mean flushing.
"""

from __future__ import annotations

import os
import time
from typing import Any, Dict, List

import jax
import numpy as np

from simseg_tpu.checkpoint.native import (
    dump_config_snapshot,
    has_checkpoint,
    load_checkpoint,
    save_checkpoint,
)
from simseg_tpu.core.hooks import Hook
from simseg_tpu.utils.logger import logger
from simseg_tpu.utils.retrieval import retrieval_summary


class LogHook(Hook):

    def __init__(self) -> None:
        # also set here so drivers that call runner.train() directly
        # (benchmarks) work without the run() lifecycle
        self._t0 = time.time()
        self._step_times: List[float] = []

    def before_run(self, runner) -> None:
        self._t0 = time.time()
        self._step_times = []

    def before_train_step(self, runner) -> None:
        self._t0 = time.time()

    def after_train_step(self, runner) -> None:
        self._step_times.append(time.time() - self._t0)
        interval = runner.cfg.log.interval_train
        if not self.every_n_inner_steps(runner, interval):
            return
        # materialize device metrics only at log cadence; print every scalar
        # the step emits (parity: reference LogHook prints the whole
        # batch_output dict, core/hooks/log.py:97-109)
        metrics = {}
        for k, v in sorted(jax.device_get(runner.outputs).items()):
            try:
                metrics[k] = float(v)
            except (TypeError, ValueError):
                continue
        # stash the materialized dict for same-cadence consumers (WandbHook)
        # so the device pull happens once per log step — on the tunneled TPU
        # platform a second device_get is a second blocking sync
        runner.state.logged_metrics = (runner.step, metrics)
        # samples accumulated since the last log, over wall time since the
        # last log — the interval-average throughput a user should quote
        rate = runner.state.log_metrics.pop_counter_rate("samples")
        kv = " ".join(f"{k}: {v:.4f}" for k, v in metrics.items())
        logger.info(
            f"Epoch [{runner.epoch + 1}/{runner.max_epochs}]"
            f"[{runner.inner_step + 1}/{runner.train_steps}] {kv} "
            f"step_time: {np.mean(self._step_times[-interval:]):.3f}s "
            f"({rate:.1f} img/s)"
        )

    def after_train_epoch(self, runner) -> None:
        if self._step_times:
            logger.emph(
                f"Epoch {runner.epoch + 1} done: avg step time "
                f"{np.mean(self._step_times):.3f}s over {len(self._step_times)} steps"
            )
        self._step_times = []

    def after_val_epoch(self, runner) -> None:
        """Restart the throughput window after a validation epoch so the next
        train-side img/s reading does not include validation wall time."""
        runner.state.log_metrics.pop_counter_rate("samples")

    def after_val_step(self, runner) -> None:
        """Validation progress (parity: log.py:111-123)."""
        interval = runner.cfg.log.get("interval_val", 1)
        i = runner.state.get("val_inner_step", 0)
        if interval > 0 and (i + 1) % max(interval, 1) == 0:
            logger.info(
                f"Val [{runner.state.get('val_loader_idx', 0)}]"
                f"[{i + 1}/{runner.state.get('val_steps', '?')}]"
            )


def _commit_to_mesh(runner):
    """Restored checkpoints come back as uncommitted host arrays; commit
    them to the mesh with the step fn's expected shardings (replicated, or
    the TP/ZeRO-1 per-leaf tree) so the first resumed step's input avals
    match the compiled step's — otherwise the jit cache misses once and the
    train step recompiles (the same fix as EpochRunner.__init__)."""
    from jax.sharding import NamedSharding, PartitionSpec

    sharding = getattr(runner, "_state_sharding", None)
    if sharding is None:
        sharding = NamedSharding(runner.mesh, PartitionSpec())
    return jax.device_put(runner.train_state, sharding)


class CheckpointHook(Hook):
    """Checkpointing with two backends: 'msgpack' (default, single-host
    atomic files) or 'orbax' (multihost-coordinated, async-capable) via
    cfg.ckpt.backend."""

    def _backend(self, runner) -> str:
        return runner.cfg.ckpt.get("backend", "msgpack")

    def _orbax(self, runner):
        if not hasattr(self, "_mgr"):
            from simseg_tpu.checkpoint.native import make_orbax_manager

            self._mgr = make_orbax_manager(runner.cfg.ckpt.dir)
        return self._mgr

    def before_run(self, runner) -> None:
        cfg = runner.cfg
        dump_config_snapshot(cfg.ckpt.dir, cfg)
        if self._backend(runner) == "orbax":
            from simseg_tpu.checkpoint.native import load_checkpoint_orbax

            mgr = self._orbax(runner)
            if cfg.ckpt.auto_resume and mgr.latest_step() is not None:
                runner.train_state, meta = load_checkpoint_orbax(
                    mgr, runner.train_state
                )
                runner.train_state = _commit_to_mesh(runner)
                runner.epoch = int(meta.get("epoch", 0))
                runner.step = int(meta.get("step", 0))
                runner.inner_step = int(meta.get("inner_step", 0))
                runner.state.wandb_id = meta.get("wandb_id")
                logger.emph(
                    f"Auto-resumed (orbax) at epoch {runner.epoch}, "
                    f"step {runner.step}"
                )
                return
            if cfg.ckpt.external_resume:
                self._load_external(runner, cfg.ckpt.external_resume)
            return
        if cfg.ckpt.auto_resume and has_checkpoint(cfg.ckpt.dir):
            try:
                runner.train_state, meta = load_checkpoint(
                    cfg.ckpt.dir, runner.train_state
                )
                runner.train_state = _commit_to_mesh(runner)
                runner.epoch = int(meta.get("epoch", 0))
                runner.step = int(meta.get("step", 0))
                runner.inner_step = int(meta.get("inner_step", 0))
                runner.state.wandb_id = meta.get("wandb_id")
                logger.emph(
                    f"Auto-resumed at epoch {runner.epoch}, step {runner.step}"
                )
                return
            except Exception as e:  # parity: bare-try fallback (:142-163)
                logger.warning(f"Auto-resume failed ({e}); trying external")
        if cfg.ckpt.external_resume:
            self._load_external(runner, cfg.ckpt.external_resume)

    def _load_external(self, runner, path: str) -> None:
        """torch .pth or native checkpoint as pretrained init
        (parity: tasks/clip/hooks/checkpoint.py external resume)."""
        cfg = runner.cfg
        if path.endswith((".pth", ".pt")):
            from simseg_tpu.checkpoint.torch_bridge import load_clip_checkpoint

            params, report = load_clip_checkpoint(
                path,
                runner.train_state.params,
                projection=cfg.model.projection.name,
                prefix_rules=list(cfg.model.get("pretrain_prefix_change_list", [])),
                only_image_encoder=cfg.ckpt.get("only_load_image_encoder", False),
                only_text_encoder=cfg.ckpt.get("only_load_text_encoder", False),
                strict=not cfg.ckpt.get("soft_resume", False),
            )
            runner.train_state = runner.train_state.replace(params=params)
        else:
            # params-only, like the torch branch: external_resume is a
            # pretrained INIT, so the old run's optimizer moments and step
            # counter must not leak into the fresh schedule. load_params
            # also resolves ckpt.dir-style paths (latest_ckpt pointer,
            # orbax step dirs).
            from simseg_tpu.checkpoint.native import load_params

            params = load_params(path, runner.train_state.params)
            runner.train_state = runner.train_state.replace(params=params)
        logger.emph(f"Loaded external checkpoint {path}")

    def _meta(self, runner) -> Dict[str, Any]:
        return {
            "epoch": runner.epoch,
            "step": runner.step,
            "inner_step": runner.inner_step + 1,
            "wandb_id": runner.state.get("wandb_id"),
        }

    def _save(self, runner, name: str, meta) -> None:
        if self._backend(runner) == "orbax":
            from simseg_tpu.checkpoint.native import save_checkpoint_orbax

            save_checkpoint_orbax(self._orbax(runner), runner.step,
                                  runner.train_state, meta)
        else:
            save_checkpoint(runner.cfg.ckpt.dir, name, runner.train_state, meta)

    def after_train_step(self, runner) -> None:
        interval = runner.cfg.ckpt.step_interval
        if interval > 0 and self.every_n_steps(runner, interval):
            self._save(runner, runner.cfg.ckpt.filename, self._meta(runner))

    def after_train_epoch(self, runner) -> None:
        meta = self._meta(runner)
        meta["epoch"] = runner.epoch + 1
        meta["inner_step"] = 0
        self._save(runner, f"epoch_{runner.epoch + 1:03d}", meta)

    def after_run(self, runner) -> None:
        if self._backend(runner) == "orbax" and hasattr(self, "_mgr"):
            self._mgr.wait_until_finished()


class PreemptionHook(Hook):
    """Graceful TPU preemption (beyond the reference, SURVEY.md §5 failure
    recovery): on SIGTERM — what a reclaimed TPU VM receives — finish the
    in-flight step, write a step checkpoint through the registered
    CheckpointHook, and exit 0 so a restarted job auto-resumes mid-epoch.

    Single-SIGTERM semantics: a second SIGTERM falls through to the default
    handler (immediate kill). Installed per process; on pods each process
    checkpoints its replicated state (identical content), matching the
    CheckpointHook's write discipline."""

    def before_run(self, runner) -> None:
        import signal

        def _handler(signum, frame):
            runner.state.preempt_requested = True
            signal.signal(signal.SIGTERM, self._orig)
            logger.warning(
                "SIGTERM received — checkpointing after the current step, "
                "then exiting 0 for auto-resume"
            )

        self._orig = signal.signal(signal.SIGTERM, _handler)

    def after_train_step(self, runner) -> None:
        if not runner.state.get("preempt_requested"):
            return
        saved = False
        for hook in runner._hooks:
            if isinstance(hook, CheckpointHook):
                hook._save(runner, runner.cfg.ckpt.filename, hook._meta(runner))
                if runner.cfg.ckpt.get("backend", "msgpack") == "orbax" and \
                        hasattr(hook, "_mgr"):
                    hook._mgr.wait_until_finished()
                saved = True
        status = "written" if saved else "SKIPPED (no CheckpointHook)"
        logger.emph(
            f"Preemption checkpoint {status} at epoch {runner.epoch}, "
            f"step {runner.step} — exiting"
        )
        raise SystemExit(0)


def _local_rows(arr) -> np.ndarray:
    """Host rows of a batch-sharded eval output. Multi-process meshes leave
    the array only partially addressable — the local shards are exactly this
    process's loader rows (the per-process eval shard), in batch order; the
    cross-process gather happens later on numpy (process_allgather)."""
    if isinstance(arr, jax.Array) and not arr.is_fully_addressable:
        # dedup by index: on a mesh with a 'model'/'pipe' axis each row
        # block is replicated across that axis, so a host's addressable
        # shards repeat the same rows once per replica
        seen, rows = set(), []
        for s in sorted(arr.addressable_shards,
                        key=lambda s: s.index[0].start or 0):
            key = tuple((sl.start, sl.stop) for sl in s.index)
            if key in seen:
                continue
            seen.add(key)
            rows.append(np.asarray(s.data))
        return np.concatenate(rows)
    return np.asarray(jax.device_get(arr))


class RetrievalEvalHook(Hook):
    """Collect per-step embeddings; epoch end: R@1/5/10 + RSUM
    (parity: tasks/clip/hooks/eval.py:9-99; the all-gather of the reference
    is unnecessary — eval embeddings are already globally addressable)."""

    def before_val_epoch(self, runner) -> None:
        self._img, self._txt, self._iid, self._cid = [], [], [], []

    def after_val_step(self, runner) -> None:
        out = runner.outputs
        self._img.append(_local_rows(out["image_emb"]))
        self._txt.append(_local_rows(out["text_emb"]))
        if out.get("image_id") is not None:
            self._iid.append(np.asarray(out["image_id"]))
            self._cid.append(np.asarray(out["caption_id"]))

    def after_val_epoch(self, runner) -> None:
        img = np.concatenate(self._img)
        txt = np.concatenate(self._txt)
        if self._iid:
            iid = np.concatenate(self._iid)
            cid = np.concatenate(self._cid)
        else:
            iid = np.arange(img.shape[0])
            cid = np.arange(txt.shape[0])
        if jax.process_count() > 1 and not runner.cfg.data.get("single_eval", True):
            # pod eval: each process embedded its own shard — gather all
            # (parity: eval.py all_gather of embeddings + ids)
            from simseg_tpu.parallel.collectives import process_allgather

            img = process_allgather(img).reshape(-1, img.shape[-1])
            txt = process_allgather(txt).reshape(-1, txt.shape[-1])
            iid = process_allgather(iid).reshape(-1)
            cid = process_allgather(cid).reshape(-1)
        keep = iid > -1  # drop padding rows (eval.py:32-33)
        summary = retrieval_summary(img[keep], txt[keep], iid[keep], cid[keep])
        runner.state.retrieval_summary = summary
        pretty = " ".join(f"{k}: {v:.4f}" for k, v in summary.items())
        logger.emph(f"[retrieval val #{runner.state.get('val_loader_idx', 0)}] {pretty}")


class ProfileHook(Hook):
    """Capture a jax.profiler trace over a step window (SURVEY.md §5: the
    reference only wall-clocks steps; on TPU a real trace is nearly free).
    Enable with cfg.profile = {'start_step': N, 'num_steps': K, 'dir': ...}.
    View with TensorBoard or xprof."""

    def __init__(self) -> None:
        self._active = False

    def before_train_step(self, runner) -> None:
        prof = runner.cfg.get("profile", {}) or {}
        if not prof or self._active:
            return
        if runner.step == prof.get("start_step", 10):
            import jax

            trace_dir = prof.get("dir", os.path.join(runner.cfg.ckpt.dir, "trace"))
            jax.profiler.start_trace(trace_dir)
            self._active = True
            self._stop_at = runner.step + prof.get("num_steps", 5)
            logger.emph(f"Profiler trace started -> {trace_dir}")

    def after_train_step(self, runner) -> None:
        if self._active and runner.step >= self._stop_at:
            import jax

            jax.block_until_ready(runner.outputs.get("loss"))
            jax.profiler.stop_trace()
            self._active = False
            logger.emph("Profiler trace stopped")


class LinearEvalHook(Hook):
    """Gather predictions + labels during validation; top-1/5 accuracy at
    epoch end (parity: tasks/linear_prob/hooks/eval.py:9-54)."""

    def before_val_epoch(self, runner) -> None:
        self._logits, self._labels = [], []

    def after_val_step(self, runner) -> None:
        self._logits.append(_local_rows(runner.outputs["logits"]))
        self._labels.append(np.asarray(runner.outputs["label"]))

    def after_val_epoch(self, runner) -> None:
        logits = np.concatenate(self._logits)
        labels = np.concatenate(self._labels)
        if jax.process_count() > 1 and not runner.cfg.data.get("single_eval",
                                                               True):
            # distributed eval (reference linear hooks/eval.py): gather the
            # per-process shards so every process reports full-set accuracy
            from simseg_tpu.parallel.collectives import process_allgather

            logits = process_allgather(logits).reshape(-1, logits.shape[-1])
            labels = process_allgather(labels).reshape(-1)
        top5 = np.argsort(-logits, axis=1)[:, :5]
        acc1 = float(np.mean(top5[:, 0] == labels))
        acc5 = float(np.mean(np.any(top5 == labels[:, None], axis=1)))
        runner.state.linear_eval = {"acc1": acc1, "acc5": acc5}
        logger.emph(f"[linear eval] top-1: {acc1:.4f} top-5: {acc5:.4f}")


class WandbHook(Hook):
    def before_run(self, runner) -> None:
        try:
            import wandb
        except ImportError:
            logger.warning("wandb not installed; WandbHook disabled")
            self._run = None
            return
        cfg = runner.cfg
        self._run = wandb.init(
            project=cfg.wandb.project,
            entity=cfg.wandb.entity,
            id=runner.state.get("wandb_id"),
            resume="allow",
            config=cfg.to_dict(),
        )
        runner.state.wandb_id = self._run.id

    def after_train_step(self, runner) -> None:
        if getattr(self, "_run", None) is None:
            return
        if not self.every_n_inner_steps(runner, runner.cfg.log.interval_train):
            return
        keys = runner.cfg.wandb.train_record_keys
        stashed = runner.state.get("logged_metrics")
        if stashed and stashed[0] == runner.step:
            # LogHook (higher priority, same cadence) already pulled this
            # step's metrics — reuse instead of a second device sync
            pulled = stashed[1]
        else:
            pulled = jax.device_get(runner.outputs)
        metrics = {k: float(v) for k, v in pulled.items() if k in keys}
        self._run.log(metrics, step=runner.step)

    def after_val_epoch(self, runner) -> None:
        if getattr(self, "_run", None) is None:
            return
        if runner.state.get("retrieval_summary"):
            self._run.log(dict(runner.state.retrieval_summary), step=runner.step)

    def after_run(self, runner) -> None:
        if getattr(self, "_run", None) is not None:
            self._run.finish()
