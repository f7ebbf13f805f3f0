"""Training runners: host-side epoch/step loops driving the jitted step.

Parity: reference ``simseg/core/runners/base_runner.py:20-86`` (hook
registry + call fan-out), ``epoch_runner.py:15-178`` (epoch/step loops,
steps math, step-interval validation, mid-epoch resume),
``tasks/clip/clip_runner.py:19-299`` (CLIP hook wiring, the three train
modes, batch_processor) and ``tasks/linear_prob/linear_runner.py:20-200``.
The mutable-model/optimizer plumbing is replaced by a functional TrainState
threaded through a pjit-compiled step; hooks observe the same lifecycle
points on the host.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from simseg_tpu.core.hooks import Hook, HookMode, LogMetrics, Priority
from simseg_tpu.core.lr_schedule import build_schedule
from simseg_tpu.core.optim import build_optimizer
from simseg_tpu.data.datasets import debias_batches, sequential_batches
from simseg_tpu.data.transforms import normalize_images
from simseg_tpu.engine.bsgs import make_bsgs_train_step
from simseg_tpu.engine.train_step import TrainState, make_eval_step, make_train_step
from simseg_tpu.parallel import batch_shards, make_mesh, shard_batch
from simseg_tpu.utils.collections import AttrDict


class BaseRunner:
    """Hook registry + fan-out (parity: base_runner.py:20-86)."""

    def __init__(self, cfg) -> None:
        self.cfg = cfg
        self.state = AttrDict()  # hook scratch space
        self.state.log_metrics = LogMetrics()
        self._hooks: List[Hook] = []
        self.inference = bool(cfg.get("inference", False))

    def register_hook(self, hook: Hook, priority: Priority = Priority.NORMAL,
                      hook_mode: HookMode = HookMode.GLOBAL) -> None:
        if self.inference and hook_mode == HookMode.TRAIN:
            return
        if not self.inference and hook_mode == HookMode.VAL:
            return
        hook._priority = int(priority)
        self._hooks.append(hook)
        self._hooks.sort(key=lambda h: h._priority)

    def call_hook(self, fn_name: str) -> None:
        for hook in self._hooks:
            getattr(hook, fn_name)(self)


class EpochRunner(BaseRunner):
    """Epoch/step loops with hook callbacks (parity: epoch_runner.py)."""

    def __init__(
        self,
        cfg,
        model,
        dataloaders: Dict[str, Any],
        params=None,
        mesh=None,
        rng: Optional[jax.Array] = None,
    ) -> None:
        super().__init__(cfg)
        self.model = model
        self.mesh = mesh if mesh is not None else make_mesh()
        self.train_loaders: Sequence = dataloaders.get("train") or []
        self.val_loaders: Sequence = dataloaders.get("val") or []
        self.train_type = cfg.data.get("train_type", "shuffle")

        self.epoch = 0
        self.step = 0
        self.inner_step = 0
        self.max_epochs = cfg.epoch
        self.val_interval = cfg.runner.val_interval
        self.val_interval_steps = cfg.runner.val_interval_steps

        # batch divisibility guard (parity: core/initial.py:68-72). The
        # batch is split batch_shards(mesh) ways — under tensor parallelism
        # that's fewer than the device count (each TP group shares examples)
        n_shards = batch_shards(self.mesh)
        if self.train_loaders and cfg.data.batch_size % n_shards != 0:
            raise ValueError(
                f"data.batch_size {cfg.data.batch_size} must be divisible by "
                f"the batch shard count {n_shards}"
            )

        # steps math (parity: epoch_runner.py:39-65)
        loader_steps = sum(len(l) for l in self.train_loaders)
        self.train_steps = (
            cfg.data.train_steps if cfg.data.train_steps > 0 else loader_steps
        )
        self.total_steps = max(self.train_steps * self.max_epochs, 1)

        # `rng or ...` would evaluate the truthiness of a JAX key array
        self._rng = rng if rng is not None else jax.random.key(cfg.seed or 0)
        if params is None:
            params = self._init_params(self._rng)
        frozen = tuple(self.frozen_patterns())
        if isinstance(params, dict) and "batch_stats" in params:
            # BN running statistics are state, not parameters — never let the
            # optimizer touch them (they receive nonzero grads because the
            # forward reads them; reference parity: freeze_cnn_bn mode)
            frozen = frozen + (r"^batch_stats/",)
        tx, set_lr = build_optimizer(cfg, params, frozen_patterns=frozen)
        self.tx = tx
        self._set_lr = set_lr
        self.train_state = TrainState.create(params, tx)
        self.lr_schedule = build_schedule(cfg, self.total_steps)

        self._norm_mean = tuple(cfg.transforms.normalize.mean)
        self._norm_std = tuple(cfg.transforms.normalize.std)
        self.outputs: Dict[str, Any] = {}

        # per-leaf state shardings when the step fn runs in factory form
        # (tensor parallelism / ZeRO-1); None = fully replicated. The
        # factory places the state itself (directly into the sharded
        # layout — a replicated commit first would peak at the full
        # unsharded state per device, defeating ZeRO-1 exactly when it is
        # needed); the replicated commit below covers the plain-DP path so
        # the first step's input avals match the step's output and the jit
        # cache doesn't miss once (a 20-90s recompile on TPU).
        self._state_sharding = None
        self.build_step_fns()
        if self._state_sharding is None:
            from jax.sharding import NamedSharding, PartitionSpec

            self.train_state = jax.device_put(
                self.train_state, NamedSharding(self.mesh, PartitionSpec())
            )
        self.init_hook()
        self.call_hook("init_runner")

    # -- subclass API ------------------------------------------------------------
    def frozen_patterns(self):
        """Regexes of parameter paths excluded from optimization (the
        reference's requires_grad=False tower gating)."""
        return ()

    def _init_params(self, rng):
        raise NotImplementedError

    def build_step_fns(self) -> None:
        raise NotImplementedError

    def batch_processor(self, batch, device_batch=None) -> Dict[str, Any]:
        raise NotImplementedError

    def val_step(self, batch) -> None:
        raise NotImplementedError

    def init_hook(self) -> None:
        from simseg_tpu.core.train_hooks import (
            CheckpointHook,
            LogHook,
            PreemptionHook,
            ProfileHook,
            WandbHook,
        )

        self.register_hook(CheckpointHook(), Priority.LOW)
        # runs after CheckpointHook's own interval save (higher number =
        # later) so a preemption save never precedes a same-step interval save
        self.register_hook(PreemptionHook(), Priority.VERY_LOW)
        self.register_hook(LogHook(), Priority.VERY_LOW)
        if self.cfg.get("profile"):
            self.register_hook(ProfileHook(), Priority.HIGH)
        if self.cfg.get("wandb", {}).get("enable", False):
            self.register_hook(WandbHook(), Priority.LOWEST)

    # -- shared plumbing ------------------------------------------------------------
    def _prepare_batch(self, batch: Dict[str, np.ndarray]) -> Dict[str, Any]:
        device_batch = {
            k: v for k, v in batch.items()
            if k in ("image", "input_ids", "attention_mask", "ignore_mask", "label")
        }
        sharded = shard_batch(device_batch, self.mesh)
        if str(sharded["image"].dtype) == "uint8":
            sharded["image"] = normalize_images(
                sharded["image"], self._norm_mean, self._norm_std
            )
        return sharded

    def _step_rng(self) -> Optional[jax.Array]:
        if self.cfg.runner.get("stable_random", "none") != "none":
            return jax.random.fold_in(self._rng, self.step)
        return None

    def _train_batch_iter(self):
        for loader in self.train_loaders:
            if hasattr(loader, "set_epoch"):
                loader.set_epoch(self.epoch)
        if self.train_type == "shuffle":
            return iter(self.train_loaders[0])
        if self.train_type == "sequential":
            return sequential_batches(self.train_loaders)
        if self.train_type == "debias":
            return debias_batches(self.train_loaders, seed=self.epoch)
        raise NotImplementedError(self.train_type)

    # -- loops -------------------------------------------------------------------
    def run(self) -> None:
        self.call_hook("before_run")
        while self.epoch < self.max_epochs:
            self.train()
            self.epoch += 1
            if (
                self.val_loaders
                and self.val_interval_steps < 0
                and self.epoch % self.val_interval == 0
            ):
                for i, loader in enumerate(self.val_loaders):
                    self.val(loader, i)
        self.call_hook("after_run")

    def _step_batch_stream(self, start_inner: int):
        """(inner_step, batch) pairs honoring the train_steps cap and the
        mid-epoch resume skip (clip_runner.py:267-278)."""
        for i, batch in enumerate(self._train_batch_iter()):
            if i >= self.train_steps:
                # run exactly train_steps steps when data.train_steps caps a
                # longer loader (parity: epoch_runner.py:77-108)
                break
            if i < start_inner:
                continue
            yield i, batch

    def _staged_stream(self, pairs, size: int):
        """Stage ``_prepare_batch`` (shard_batch H2D + device-side
        normalize) for the next ``size`` batches while the current step
        runs: the transfers are dispatched ahead of the blocking points of
        step N, so H2D rides the gaps instead of the critical path
        (``data.device_prefetch``; the TPU-native form of the reference's
        pinned-memory non_blocking copies, clip_runner.py:65-77)."""
        import collections

        queue = collections.deque()
        it = iter(pairs)

        def put():
            i, b = next(it)
            queue.append((i, b, self._prepare_batch(b)))

        for _ in range(max(1, size)):
            try:
                put()
            except StopIteration:
                break
        while queue:
            try:
                put()
            except StopIteration:
                pass
            yield queue.popleft()

    def train(self) -> None:
        self.call_hook("_before_train_epoch")
        start_inner = self.inner_step  # mid-epoch resume (clip_runner.py:267-278)
        self.inner_step = 0
        stream = self._step_batch_stream(start_inner)
        prefetch = int(self.cfg.data.get("device_prefetch", 2))
        if prefetch > 0:
            stream = self._staged_stream(stream, prefetch)
        else:
            stream = ((i, b, None) for i, b in stream)
        for i, batch, device_batch in stream:
            self.inner_step = i
            self.call_hook("_before_train_step")
            self.outputs = self.batch_processor(batch, device_batch)
            # increment before after-step hooks so checkpoints record the
            # count of completed steps (parity: reference gen_checkpoint
            # saves step+1, core/hooks/checkpoint.py:26) — resume then
            # continues the LR schedule instead of replaying one step
            self.step += 1
            self.call_hook("_after_train_step")
            if (
                self.val_interval_steps > 0
                and self.step % self.val_interval_steps == 0
            ):
                for j, loader in enumerate(self.val_loaders):
                    self.val(loader, j)
        self.inner_step = 0
        self.call_hook("_after_train_epoch")

    def val(self, loader, loader_idx: int = 0) -> None:
        self.state.val_loader_idx = loader_idx
        val_steps = self.cfg.data.get("val_steps", -1)
        self.state.val_steps = val_steps if val_steps > 0 else len(loader)
        self.call_hook("_before_val_epoch")
        for i, batch in enumerate(loader):
            if 0 < val_steps <= i:
                break
            self.state.val_inner_step = i
            self.call_hook("_before_val_step")
            self.val_step(batch)
            self.call_hook("_after_val_step")
        self.call_hook("_after_val_epoch")


class CLIPRunner(EpochRunner):
    """Contrastive pretraining runner (parity: clip_runner.py,
    clip_bsgs_runner.py via cfg.runner.name='clip_bsgs')."""

    def frozen_patterns(self):
        """parity: pipelines/clip.py:199-200/217-218 + projection trainable
        flags (components/projection.py:41-43)."""
        m = self.cfg.model
        patterns = []
        if not m.image_encoder.get("trainable", True):
            patterns.append(r"^params/image_encoder/")
        if not m.text_encoder.get("trainable", True):
            patterns.append(r"^params/text_encoder/")
        proj = m.get("projection", {})
        if not proj.get("image_projector_trainable", True):
            patterns.append(r"^params/image_projection/")
        if not proj.get("text_projector_trainable", True):
            patterns.append(r"^params/text_projection/")
        return tuple(patterns)

    def _init_params(self, rng):
        size = self.cfg.transforms.input_size
        dummy = {
            "image": np.zeros((1, size, size, 3), np.float32),
            "input_ids": np.zeros((1, self.cfg.model.max_length), np.int32),
            "attention_mask": np.ones((1, self.cfg.model.max_length), np.int32),
        }
        return self.model.init(rng, dummy)

    def _adopt_step_factory(self, factory) -> None:
        """Invoke a step-fn factory (TP and/or ZeRO-1 form): it places the
        state with its per-leaf shardings and returns the jitted step."""
        self._step_fn, self.train_state = factory(self.train_state)
        self._state_sharding = jax.tree.map(
            lambda x: x.sharding, self.train_state
        )

    def build_step_fns(self) -> None:
        from simseg_tpu.parallel.mesh import (MODEL_AXIS, PIPE_AXIS,
                                              loss_group_samples)

        cfg = self.cfg
        for enc in ("image_encoder", "text_encoder"):
            quant = dict(cfg.model[enc].get("arch", {}) or {}).get(
                "quant", "none")
            if quant not in (None, "", "none"):
                # jnp.round's gradient is zero almost everywhere — a
                # quantized tower would silently train to nothing. int8 PTQ
                # is an inference-time transform (seg/retrieval eval,
                # serving export).
                raise NotImplementedError(
                    f"{enc} arch quant='{quant}' is inference-only — train "
                    "in bf16/f32 and set quant for the eval/serving config"
                )
        smoothing = cfg.loss.get("smoothing", 0.0)
        # cfg.loss.group_size is devices-per-group (the reference's unit,
        # consumed by make_mesh); the loss works on the fused global batch
        # and needs the matching samples-per-group block
        group_size = loss_group_samples(self.mesh, cfg.data.batch_size)
        zero1 = bool(cfg.dist.get("zero1", False))
        fsdp = bool(cfg.dist.get("fsdp", False))
        moe_ep = bool(cfg.dist.get("moe_ep", False))
        if cfg.runner.name == "clip_bsgs":
            from simseg_tpu.engine.train_step import _moe_enabled

            if (moe_ep or PIPE_AXIS in self.mesh.axis_names
                    or _moe_enabled(self.model)):
                # PP's GPipe forward and the MoE aux objective don't fold
                # into the two-pass analytic gradient; TP/SP/FSDP/ZeRO-1 do
                # (the scanned passes are ordinary pjit forwards)
                raise NotImplementedError(
                    "runner 'clip_bsgs' does not combine with "
                    "dist.pp_size>1 or MoE towers (use runner.name='clip')"
                )
            loss_name = cfg.loss.get("name", "NCE")
            if loss_name not in ("NCE", "MixUpNCE"):
                # the analytic two-pass gradients are derived for (mixup-)
                # InfoNCE only (reference BSGS likewise,
                # clip_bsgs_runner.py:358-396) — refuse rather than silently
                # training a different objective than configured
                raise NotImplementedError(
                    f"runner 'clip_bsgs' supports loss NCE/MixUpNCE, got "
                    f"'{loss_name}' (use runner.name='clip')"
                )
            if cfg.loss.get("extra_losses", None):
                # the additive extra terms ride clip_loss_fn's generic
                # compute() path; the analytic two-pass gradient has no
                # hook for them — refuse rather than silently dropping
                # configured loss terms
                raise NotImplementedError(
                    "runner 'clip_bsgs' does not support loss.extra_losses "
                    "(use runner.name='clip')"
                )
            if (isinstance(self.train_state.params, dict)
                    and "batch_stats" in self.train_state.params
                    and not cfg.model.get("freeze_cnn_bn", False)):
                raise NotImplementedError(
                    "runner 'clip_bsgs' does not thread live BatchNorm "
                    "statistics (the two-pass re-forward would double-update "
                    "them); set model.freeze_cnn_bn=true or use "
                    "runner.name='clip'"
                )
            num_micro = max(1, cfg.data.batch_size // cfg.data.batch_size_train)
            built = make_bsgs_train_step(
                self.model, self.tx, self._set_lr, num_micro=num_micro,
                mesh=self.mesh, smoothing=smoothing,
                group_size=group_size,
                mixup=loss_name == "MixUpNCE",
                mixup_alpha_param=cfg.get("mixup", {}).get("alpha", 0.2),
                shard_opt_state=zero1,
                fsdp=fsdp,
            )
            if zero1 or fsdp or MODEL_AXIS in self.mesh.axis_names:
                self._adopt_step_factory(built)
            else:
                self._step_fn = built
        else:
            built = make_train_step(
                self.model, self.tx, self._set_lr, mesh=self.mesh,
                smoothing=smoothing,
                group_size=group_size,
                loss_name=cfg.loss.get("name", "NCE"),
                mixup_alpha_param=cfg.get("mixup", {}).get("alpha", 0.2),
                # 'shard': mix/flip within each data shard's block — the
                # reference's per-GPU pairing under DDP (mml_loss.py:146-197)
                # and shard-local on TPU; 'global': one fused-batch flip
                mixup_shards=(
                    batch_shards(self.mesh)
                    if cfg.get("mixup", {}).get("pairing", "shard") == "shard"
                    else 1),
                triplet_margin=cfg.loss.get("triplet_loss", {}).get("margin", 0.2),
                triplet_reduce=cfg.loss.get("triplet_loss", {}).get("reduce_mode", "max"),
                extra_losses=tuple(cfg.loss.get("extra_losses", []) or ()),
                bn_training=not cfg.model.get("freeze_cnn_bn", False),
                shard_opt_state=zero1,
                fsdp=fsdp,
                pp_micro=int(cfg.dist.get("pp_micro", 4)),
                moe_ep=moe_ep,
                moe_aux_weight=float(cfg.loss.get("moe_aux_weight", 0.01)),
            )
            if (zero1 or fsdp or moe_ep
                    or MODEL_AXIS in self.mesh.axis_names):
                # factory form: the step owns the state placement (TP param
                # shardings and/or ZeRO-1 optimizer moments)
                self._adopt_step_factory(built)
            else:
                self._step_fn = built
        self._eval_fn = make_eval_step(self.model, self.mesh)

    def init_hook(self) -> None:
        """parity: clip_runner.py:44-63 hook wiring."""
        super().init_hook()
        if self.val_loaders:
            from simseg_tpu.core.train_hooks import RetrievalEvalHook

            self.register_hook(RetrievalEvalHook(), Priority.VERY_LOW)

    def batch_processor(self, batch: Dict[str, np.ndarray],
                        device_batch=None) -> Dict[str, Any]:
        """One train step (parity: clip_runner.py:216-251). Returns device
        metrics — hooks materialize lazily at log cadence. device_batch:
        pre-staged device arrays from the prefetch stream (else prepared
        here)."""
        if device_batch is None:
            device_batch = self._prepare_batch(batch)
        lr = self.lr_schedule(self.step)
        self.train_state, metrics = self._step_fn(
            self.train_state, device_batch, self._step_rng(), lr
        )
        self.state.log_metrics.add_counter("samples", batch["image"].shape[0])
        return metrics

    def val_step(self, batch) -> None:
        device_batch = self._prepare_batch(batch)
        img, txt = self._eval_fn(self.train_state.params, device_batch)
        self.outputs = {
            "image_emb": img,
            "text_emb": txt,
            "image_id": batch.get("image_id"),
            "caption_id": batch.get("caption_id"),
        }


class LinearProbRunner(EpochRunner):
    """ImageNet linear probing (parity: linear_runner.py:20-200)."""

    def frozen_patterns(self):
        if not self.cfg.model.image_encoder.get("trainable", True):
            return (r"^params/image_encoder/",)
        return ()

    def _init_params(self, rng):
        size = self.cfg.transforms.input_size
        dummy = {
            "image": np.zeros((1, size, size, 3), np.float32),
            "label": np.zeros((1,), np.int64),
        }
        return self.model.init(rng, dummy)

    def build_step_fns(self) -> None:
        import optax
        from jax.sharding import NamedSharding, PartitionSpec as P

        from simseg_tpu.models.linear_prob import linear_prob_loss_fn
        from simseg_tpu.parallel.mesh import MODEL_AXIS

        if MODEL_AXIS in self.mesh.axis_names:
            raise NotImplementedError(
                "linear probing is data-parallel only (the encoder is "
                "frozen and the classifier tiny) — use dist.tp_size=1"
            )
        smoothing = self.cfg.loss.get("smoothing", 0.0)
        mixup_cfg = self.cfg.get("mixup", {}) or {}
        mixup_alpha = (float(mixup_cfg.get("alpha", 0.2))
                       if mixup_cfg.get("enable", False) else 0.0)
        num_classes = self.cfg.model.classifier.num_classes
        self._needs_step_rng = mixup_alpha > 0
        model, tx, set_lr = self.model, self.tx, self._set_lr

        stable = self.cfg.runner.get("stable_random", "none") != "none"

        def step_fn(state, batch, rng, lr):
            fwd_rng = rng
            if mixup_alpha > 0:
                # batch mixup (cfg.mixup.*): Beta(a, a) blend of the batch
                # with its flip, trained against the matching soft targets
                # (the reference declares the same keys but never reads
                # them; pairing mirrors its MixUpNCE batch flip,
                # mml_loss.py:146-197). With stable_random off the rng
                # exists only for the blend — the tower forward stays
                # deterministic, exactly as it is without mixup.
                from simseg_tpu.engine.train_step import _block_flip
                from simseg_tpu.parallel.mesh import batch_shards

                mix_rng, carried = jax.random.split(rng)
                fwd_rng = carried if stable else None
                lam = jax.random.beta(mix_rng, mixup_alpha, mixup_alpha)
                images = batch["image"]
                onehot = jax.nn.one_hot(batch["label"], num_classes)
                if smoothing > 0:
                    # cfg.loss.smoothing composes with mixup: smooth the
                    # one-hots before blending (CE is linear in the target,
                    # so this equals smoothing each mixed term)
                    onehot = onehot * (1.0 - smoothing) + smoothing / num_classes
                # flip within each data shard's block (like the CLIP
                # MixUpNCE pairing): a global jnp.flip would relayout the
                # whole image tensor across chips every step
                n_flip = batch_shards(self.mesh)
                batch = dict(
                    batch,
                    image=lam * images
                    + (1.0 - lam) * _block_flip(images, n_flip),
                    label=lam * onehot
                    + (1.0 - lam) * _block_flip(onehot, n_flip),
                )
            (_, metrics), grads = jax.value_and_grad(
                lambda p: linear_prob_loss_fn(model, p, batch, fwd_rng,
                                              smoothing,
                                              soft_targets=mixup_alpha > 0),
                has_aux=True,
            )(state.params)
            opt_state = set_lr(state.opt_state, lr)
            updates, opt_state = tx.update(grads, opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            metrics = dict(metrics)
            metrics["lr"] = lr
            return (
                state.replace(params=params, opt_state=opt_state,
                              step=state.step + 1),
                metrics,
            )

        from simseg_tpu.parallel.mesh import data_sharding

        repl = NamedSharding(self.mesh, P())
        data = data_sharding(self.mesh)
        self._step_fn = jax.jit(
            step_fn, in_shardings=(repl, data, repl, repl),
            out_shardings=(repl, repl),
        )

        def eval_fn(params, batch):
            logits = model.apply(params, batch, deterministic=True)
            return logits

        self._eval_fn = jax.jit(
            eval_fn, in_shardings=(repl, data), out_shardings=data
        )

    def init_hook(self) -> None:
        super().init_hook()
        if self.val_loaders:
            from simseg_tpu.core.train_hooks import LinearEvalHook

            self.register_hook(LinearEvalHook(), Priority.VERY_LOW)

    def batch_processor(self, batch, device_batch=None) -> Dict[str, Any]:
        if device_batch is None:
            device_batch = self._prepare_batch(batch)
        lr = self.lr_schedule(self.step)
        rng = self._step_rng()
        if rng is None and getattr(self, "_needs_step_rng", False):
            # mixup samples its Beta blend from the step key even when
            # runner.stable_random is off
            rng = jax.random.fold_in(self._rng, self.step)
        self.train_state, metrics = self._step_fn(
            self.train_state, device_batch, rng, lr
        )
        self.state.log_metrics.add_counter("samples", batch["image"].shape[0])
        return metrics

    def val_step(self, batch) -> None:
        device_batch = self._prepare_batch(batch)
        logits = self._eval_fn(self.train_state.params, device_batch)
        self.outputs = {"logits": logits, "label": batch["label"]}
