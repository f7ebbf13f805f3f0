"""The jitted contrastive train step.

Parity: reference hot loop ``tasks/clip/clip_runner.py:216-251``
(batch_processor: forward -> loss dict -> backward -> step) and the DDP
machinery around it (``core/hooks/dist.py``, ``core/hooks/optimizer.py``).

TPU-native shape: one pure function ``(state, batch, rng, lr) -> (state,
metrics)`` jitted once over a ``jax.sharding.Mesh``. The batch is sharded on
its leading dim over every mesh axis; parameters and optimizer state are
replicated. XLA inserts the embedding all-gather for the global InfoNCE
negatives (the reference's GatherLayer) and the gradient all-reduce (the
reference's DDP) automatically from the shardings — both ride ICI.
"""

from __future__ import annotations

import contextlib
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from simseg_tpu.parallel.mesh import MODEL_AXIS, batch_axes, data_sharding
from simseg_tpu.parallel.tp import tp_shardings
from simseg_tpu.ops.attention import attention_training
from simseg_tpu.ops.losses import (
    mixup_nce,
    mse_embedding_loss,
    symmetric_info_nce,
    triplet_loss,
)


# PRNG fold tag for the mixup lambda draw — outside the 0..num_micro-1 range
# the BSGS micro-batch dropout keys use, so lambda never shares a key with a
# dropout mask
MIXUP_FOLD_TAG = 0x7FFFFFFF


def _moe_enabled(model) -> bool:
    """True when either tower has MoE blocks (arch knob ``moe_experts``,
    models/vit.py / models/bert.py) so the loss must collect the sown
    load-balance aux."""
    img_arch = dict(getattr(model, "image_arch", None) or ())
    txt_arch = dict(getattr(model, "text_arch", None) or ())
    img_moe = ("vit" in getattr(model, "image_tag", "")
               and int(img_arch.get("moe_experts", 0) or 0) > 0)
    txt_moe = int(txt_arch.get("moe_experts", 0) or 0) > 0
    return img_moe or txt_moe


def mixup_lambda(rng: Optional[jax.Array], step, alpha: float) -> jnp.ndarray:
    """Per-step Beta(alpha, alpha) mixup coefficient, lam in [0.5, 1].

    With stable_random off (rng None) the draw is derived from the global
    step so it still varies per step instead of freezing at one constant."""
    if rng is not None:
        key = jax.random.fold_in(rng, MIXUP_FOLD_TAG)
    else:
        key = jax.random.fold_in(jax.random.key(0),
                                 step if step is not None else 0)
    lam = jax.random.beta(key, alpha, alpha)
    return jnp.maximum(lam, 1.0 - lam)


def _block_flip(x: jnp.ndarray, shards: int) -> jnp.ndarray:
    """Reverse the leading dim within each of ``shards`` equal blocks
    (shards=1 -> plain [::-1]). With the batch dim sharded over ``shards``
    data shards, each block is shard-local — no cross-chip gather."""
    shards = max(1, shards)
    n = x.shape[0]
    if shards == 1 or n % shards != 0:
        return x[::-1]
    return x.reshape((shards, n // shards) + x.shape[1:])[:, ::-1].reshape(x.shape)


class TrainState(struct.PyTreeNode):
    params: Any
    opt_state: Any
    step: jnp.ndarray  # int32 scalar

    @classmethod
    def create(cls, params, tx: optax.GradientTransformation) -> "TrainState":
        return cls(params=params, opt_state=tx.init(params),
                   step=jnp.zeros((), jnp.int32))


def opt_state_sharding(opt_state, mesh: Mesh, min_size: int = 2**16):
    """ZeRO-1-style sharding spec for the optimizer state: each moment
    tensor above ``min_size`` elements is sharded along its largest
    mesh-divisible axis over the data axis (the reference's DP keeps full
    optimizer replicas per GPU; on TPU the sharded state cuts HBM by
    ~2x params x (1 - 1/n_devices) and XLA inserts the gather around the
    update)."""
    # shard over the batch axes (never the tensor-parallel 'model' axis —
    # TP moments are already split by the mirrored param shardings)
    axes = batch_axes(mesh)
    n = 1
    for ax in axes:
        n *= mesh.shape[ax]
    axis = axes if len(axes) > 1 else axes[0]

    def spec_of(x):
        shape = getattr(x, "shape", ())
        if not shape or np.prod(shape) < min_size:
            return NamedSharding(mesh, P())
        for dim in sorted(range(len(shape)), key=lambda d: -shape[d]):
            if shape[dim] % n == 0:
                spec = [None] * len(shape)
                spec[dim] = axis
                return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree.map(spec_of, opt_state)


def derive_state_shardings(state_template, mesh: Mesh, tp: bool = False,
                           fsdp: bool = False, moe_ep: bool = False,
                           shard_opt_state: bool = False,
                           opt_shard_min_size: int = 2**16,
                           fsdp_min_size: int = 2**14) -> "TrainState":
    """Per-leaf NamedShardings for a TrainState under the configured
    parallelism mix — shared by the plain and BSGS step factories.

    TP/FSDP/EP set the parameter shardings (parallel/tp.py); optimizer
    moments mirror their parameter's sharding; ZeRO-1 (shard_opt_state)
    additionally splits whatever moments remain replicated over the data
    axis."""
    repl = NamedSharding(mesh, P())
    if tp:
        param_sh = tp_shardings(state_template.params, mesh)
    else:
        param_sh = jax.tree.map(lambda _: repl, state_template.params)
    if fsdp:
        from simseg_tpu.parallel.tp import fsdp_shardings

        param_sh = fsdp_shardings(state_template.params, mesh,
                                  base=param_sh, min_size=fsdp_min_size)
    if moe_ep:
        from simseg_tpu.parallel.tp import ep_shardings

        param_sh = ep_shardings(state_template.params, mesh, base=param_sh)
    if tp or fsdp or moe_ep:
        # optimizer moments mirror the parameter shardings. GSPMD
        # cannot infer this (zeros_like moments are value-independent
        # of the params), so match structurally: optax moment leaves
        # live at paths ending with their param's path (e.g.
        # 0/trace/params/.../qkv/kernel), shape-checked for safety.
        def path_str(path):
            return "/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                            for k in path)

        by_path = {}
        flat_p, _ = jax.tree_util.tree_flatten_with_path(
            state_template.params)
        flat_s = jax.tree.leaves(param_sh)
        for (path, leaf), sh in zip(flat_p, flat_s):
            by_path["/" + path_str(path)] = (getattr(leaf, "shape", ()), sh)

        def opt_spec(path, leaf):
            p = "/" + path_str(path)
            shape = getattr(leaf, "shape", ())
            for pp, (pshape, sh) in by_path.items():
                if p.endswith(pp) and shape == pshape:
                    return sh
            return repl

        opt_sh = jax.tree_util.tree_map_with_path(
            opt_spec, state_template.opt_state)
    else:
        opt_sh = jax.tree.map(lambda _: repl, state_template.opt_state)
    if shard_opt_state:
        # ZeRO-1 over the data axis, applied to the leaves the TP
        # rules left replicated (TP-sharded moments are already
        # memory-split over 'model')
        zero_sh = opt_state_sharding(state_template.opt_state, mesh,
                                     min_size=opt_shard_min_size)
        opt_sh = jax.tree.map(
            lambda cur, z: z if cur.is_fully_replicated else cur,
            opt_sh, zero_sh,
        )
    return TrainState(params=param_sh, opt_state=opt_sh, step=repl)


def clip_loss_fn(
    model,
    params,
    batch: Dict[str, jnp.ndarray],
    rng: Optional[jax.Array],
    smoothing: float = 0.0,
    group_size: int = -1,
    loss_name: str = "NCE",
    mixup_alpha_param: float = 0.2,
    triplet_margin: float = 0.2,
    triplet_reduce: str = "max",
    extra_losses: Tuple[str, ...] = (),
    bn_training: bool = False,
    step=None,
    forward_fn: Optional[Callable] = None,
    moe_aux_weight: float = 0.01,
    mixup_shards: int = 1,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Forward + contrastive loss (parity: pipelines/clip.py:123-176
    forward_loss, dispatching on cfg.loss.name like the LOSS registry;
    cfg.loss.extra_losses adds further loss terms on the same embeddings —
    note the reference builds extra_losses modules but never invokes them
    (pipelines/linear_prob.py:25-30 with no forward call); here they
    contribute additively and are logged as <name>_loss)."""
    rngs = {"dropout": rng} if rng is not None else None

    if loss_name == "MixUpNCE":
        # single-modality (image) mixup: lam ~ Beta(a, a) per step, images
        # mixed with a block-reversed pairing (parity: mml_loss.py:146-197).
        # mixup_shards splits the fused global batch into that many equal
        # blocks and flips within each — the reference mixes within each
        # forward's input, i.e. the per-GPU batch under DDP, so the runner
        # passes batch_shards(mesh) (cfg.mixup.pairing='shard', the
        # default); 1 = one global flip. Block flips are also the better
        # TPU program: each block stays on its data shard, so the pairing
        # never moves images across chips. The BSGS runner analogously
        # flips per micro-batch.
        lam = mixup_lambda(rng, step, mixup_alpha_param)
        batch = dict(batch)
        batch["image"] = (lam * batch["image"]
                          + (1.0 - lam) * _block_flip(batch["image"],
                                                      mixup_shards))

    new_stats = None
    moe_aux = None
    if forward_fn is not None:
        # alternate model forward (pipeline parallelism, parallel/pp.py
        # make_pp_forward) — always deterministic, ViT towers only
        if (bn_training and isinstance(params, dict)
                and "batch_stats" in params):
            raise NotImplementedError("forward_fn does not support live BN")
        img, txt, temp = forward_fn(params, batch)
    elif _moe_enabled(model):
        # MoE towers sow the Switch load-balance aux loss into
        # 'intermediates' (ops/moe.py); collect and add it weighted.
        # A CNN image tower running live BN (bn_training, e.g. a MoE text
        # tower next to a ResNet with freeze_cnn_bn=false) composes here:
        # both collections ride the same mutable apply
        live_bn = (bn_training and isinstance(params, dict)
                   and "batch_stats" in params)
        (img, txt, temp), upd = model.apply(
            params, batch, deterministic=rng is None, rngs=rngs,
            mutable=["intermediates"] + (["batch_stats"] if live_bn else []),
            **({"train_bn": True} if live_bn else {}),
        )
        if live_bn:
            new_stats = upd["batch_stats"]
        # Switch convention: SUM over MoE layers (each layer's balancing
        # signal is independent of the MoE depth)
        moe_aux = sum(jnp.mean(jnp.asarray(v))
                      for v in jax.tree.leaves(upd["intermediates"]))
    elif bn_training and isinstance(params, dict) and "batch_stats" in params:
        # CNN live-BN training: forward with batch statistics, collect the
        # mutated running averages for the step to merge back (reference
        # freeze_cnn_bn=False + SyncBN — the global-batch forward under pjit
        # IS synchronized BN)
        (img, txt, temp), upd = model.apply(
            params, batch, deterministic=rng is None, rngs=rngs,
            train_bn=True, mutable=["batch_stats"],
        )
        new_stats = upd["batch_stats"]
    else:
        img, txt, temp = model.apply(
            params, batch, deterministic=rng is None, rngs=rngs
        )
    img = img.astype(jnp.float32)
    txt = txt.astype(jnp.float32)

    def compute(name):
        if name == "NCE":
            return symmetric_info_nce(
                img, txt, temp,
                ignore_mask=batch.get("ignore_mask"),
                smoothing=smoothing,
                group_size=group_size,
            )
        if name == "MSE":
            # symmetric like forward_loss's global_reduce branch
            # (pipelines/clip.py:129-141); see mse_embedding_loss docstring
            i2t, i2t_acc = mse_embedding_loss(
                img, txt, ignore_mask=batch.get("ignore_mask"))
            t2i, t2i_acc = mse_embedding_loss(
                txt, img, ignore_mask=batch.get("ignore_mask"))
            return 0.5 * (i2t + t2i), {"i2t_acc": i2t_acc, "t2i_acc": t2i_acc}
        if name == "Triplet":
            l, i2t_acc, t2i_acc = triplet_loss(img, txt, triplet_margin,
                                               triplet_reduce)
            return l, {"i2t_acc": i2t_acc, "t2i_acc": t2i_acc}
        raise NotImplementedError(f"loss '{name}'")

    if loss_name == "MixUpNCE":
        # flip_block must mirror _block_flip's divisibility fallback, or
        # the (1-lam) CE term would target rows that were never mixed in
        n = img.shape[0]
        s = max(1, mixup_shards)
        blk = n // s if (s > 1 and n % s == 0) else n
        i2t, i2t_acc = mixup_nce(img, txt, temp, lam, flip_block=blk,
                                 ignore_mask=batch.get("ignore_mask"),
                                 smoothing=smoothing, group_size=group_size)
        t2i, t2i_acc = mixup_nce(txt, img, temp, lam, flip_block=blk,
                                 ignore_mask=batch.get("ignore_mask"),
                                 smoothing=smoothing, group_size=group_size)
        loss = 0.5 * (i2t + t2i)
        accs = {"i2t_acc": i2t_acc, "t2i_acc": t2i_acc}
    else:
        loss, accs = compute(loss_name)

    metrics = {"loss": loss, "temperature": temp, **accs}
    for name in extra_losses:
        extra, _ = compute(name)
        loss = loss + extra
        metrics[f"{name.lower()}_loss"] = extra
    if moe_aux is not None:
        loss = loss + moe_aux_weight * moe_aux
        metrics["moe_aux"] = moe_aux
    metrics["loss"] = loss
    if new_stats is not None:
        # aux channel for the train step (popped before logging); not
        # differentiated (value_and_grad has_aux)
        metrics["_new_batch_stats"] = jax.lax.stop_gradient(new_stats)
    return loss, metrics


def make_train_step(
    model,
    tx: optax.GradientTransformation,
    set_lr: Callable,
    mesh: Optional[Mesh] = None,
    smoothing: float = 0.0,
    group_size: int = -1,
    donate: bool = True,
    loss_name: str = "NCE",
    shard_opt_state: bool = False,
    opt_shard_min_size: int = 2**16,
    fsdp: bool = False,
    fsdp_min_size: int = 2**14,
    pp_micro: int = 4,
    moe_ep: bool = False,
    **loss_kwargs,
):
    """Build the jitted train step.

    Returned fn: (state, batch, rng, lr) -> (state, metrics). ``lr`` is the
    host-computed scalar from the stateless schedule (the reference's
    set_lrs-before-step contract, lr_scheduler.py:59-65).

    shard_opt_state: ZeRO-1-style — optimizer moments sharded over the mesh
    (see opt_state_sharding). In this mode the return value is a factory:
    ``factory(state) -> (step_fn, placed_state)``.

    fsdp: ZeRO-3-style fully-sharded parameters over the data axis (see
    parallel/tp.py fsdp_shardings) — XLA all-gathers weights just-in-time
    and reduce-scatters gradients; moments follow their param's sharding.
    Also factory form; composes with tensor parallelism.

    pp_micro: microbatches per step when the mesh has a 'pipe' axis — the
    image tower then runs under the GPipe schedule (parallel/pp.py); the
    forward is deterministic (no dropout) in that mode.

    moe_ep: expert parallelism — MoE expert weights sharded over the 'data'
    axis (parallel/tp.py ep_shardings); GSPMD inserts the all-to-all around
    the expert FFN. Factory form, like fsdp.
    """
    from simseg_tpu.parallel.mesh import PIPE_AXIS

    if mesh is not None and PIPE_AXIS in mesh.axis_names:
        from simseg_tpu.parallel.pp import make_pp_forward

        loss_kwargs = dict(loss_kwargs,
                           forward_fn=make_pp_forward(model, mesh, pp_micro))

    # the fused fwd+bwd attention kernel (ops/flash_attention.py
    # flash_mha_train) only pays off when a backward pass exists; mark the
    # differentiated region at trace time so eligible tower shapes route
    # through it. PP keeps the einsum lowering: its forward runs inside
    # shard_map over a 'pipe' mesh, a Pallas composition this environment
    # cannot execute-validate (no multi-chip hardware).
    attn_ctx = (contextlib.nullcontext if "forward_fn" in loss_kwargs
                else attention_training)

    def step_fn(state: TrainState, batch, rng, lr):
        with attn_ctx():
            (_, metrics), grads = jax.value_and_grad(
                lambda p: clip_loss_fn(model, p, batch, rng, smoothing,
                                       group_size, loss_name=loss_name,
                                       step=state.step, **loss_kwargs),
                has_aux=True,
            )(state.params)
        metrics = dict(metrics)
        new_stats = metrics.pop("_new_batch_stats", None)
        opt_state = set_lr(state.opt_state, lr)
        updates, opt_state = tx.update(grads, opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        if new_stats is not None:
            params = {**params, "batch_stats": new_stats}
        metrics["grad_norm"] = optax.global_norm(grads)
        metrics["lr"] = lr
        return (
            state.replace(params=params, opt_state=opt_state, step=state.step + 1),
            metrics,
        )

    if mesh is None:
        return jax.jit(step_fn, donate_argnums=(0,) if donate else ())

    repl = NamedSharding(mesh, P())
    data = data_sharding(mesh)
    tp = MODEL_AXIS in mesh.axis_names

    if shard_opt_state or tp or fsdp or moe_ep:
        # factory form: the caller passes the concrete TrainState once so the
        # per-leaf optimizer shardings can be derived from its structure
        def jit_with_state(state_template):
            sh = derive_state_shardings(
                state_template, mesh, tp=tp, fsdp=fsdp, moe_ep=moe_ep,
                shard_opt_state=shard_opt_state,
                opt_shard_min_size=opt_shard_min_size,
                fsdp_min_size=fsdp_min_size,
            )
            fn = jax.jit(
                step_fn,
                in_shardings=(sh, data, repl, repl),
                out_shardings=(sh, repl),
                donate_argnums=(0,) if donate else (),
            )
            placed = jax.device_put(state_template, sh)
            return fn, placed

        return jit_with_state

    return jax.jit(
        step_fn,
        in_shardings=(repl, data, repl, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,) if donate else (),
    )


def make_eval_step(model, mesh: Optional[Mesh] = None):
    """Jitted embedding extraction for retrieval validation
    (parity: clip_runner.py val path / retrieval_evaluation.py:65-99)."""

    def eval_fn(params, batch):
        img, txt, _ = model.apply(params, batch, deterministic=True)
        return img.astype(jnp.float32), txt.astype(jnp.float32)

    if mesh is None:
        return jax.jit(eval_fn)
    data = data_sharding(mesh)
    # params in_sharding is left None so a TP-committed param tree keeps its
    # sharding instead of being gathered to replicas on every eval call
    return jax.jit(eval_fn, in_shardings=(None, data), out_shardings=(data, data))
