"""BSGS: exact big-batch contrastive gradients at micro-batch memory cost.

Parity: reference ``simseg/tasks/clip/clip_bsgs_runner.py:309-451``
(decoupled gradient accumulation): (1) a no-grad pass embeds the full batch
in micro-chunks, (2) analytic softmax gradients give per-sample "left"
matrices ``left_I = (p_i2t + p_t2i^T - 2y) @ E_text / sqrt(T)`` (:386-396),
with mixup-aware soft targets built exactly like the reference's
``y_i2t = alpha*eye + (1-alpha)*block_flip`` (:371-376) and negatives
restricted to ``loss.group_size`` sample groups (the reference's
``all_gather_group`` subgroups, :354-356), (3) a re-forward pass backprops
the surrogate ``sum(left . emb) / 2 / B / sqrt(T)`` per micro-batch
(:404-438). The reference re-seeds the RNG between the passes
(``stable_random``, :29-35, 310-312, 401-402) so dropout matches; JAX's
explicit PRNG keys give this for free (the same fold_in key is used in both
passes).

Beyond the reference, ``ignore_mask`` is supported (the reference's plain
NCE has it but its BSGS path does not): with w = 1-mask and
A1 = P_i2t - Y, A2 = P_t2i - Y the exact masked gradient is the D-sandwich
``dL/dI = (1/2B temp) diag(w) (A1 + A2^T) diag(w) @ E_text`` (and
symmetrically for text), which the left matrices absorb.

TPU-native shape: both passes are ``lax.scan`` over micro-batches inside one
jit; the analytic middle section is pure global matrix algebra on the MXU.
Under a mesh each micro-batch is itself data-sharded, so the scan composes
with pjit: XLA all-gathers embeddings once per micro-step over ICI.

The surrogate's gradient equals the true InfoNCE gradient for *all*
parameters including the learnable temperature: d(surrogate)/dT through the
re-forward's 1/sqrt(T) factor reproduces dL/dT (verified for every variant
by test_bsgs.py against direct autodiff).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from simseg_tpu.engine.train_step import TrainState, mixup_lambda
from simseg_tpu.ops.attention import attention_training

_BATCH_KEYS = ("image", "input_ids", "attention_mask")


def _split_micro(batch: Dict[str, jnp.ndarray], num_micro: int) -> Dict[str, jnp.ndarray]:
    out = {}
    for k in _BATCH_KEYS:
        if k in batch:
            x = batch[k]
            if x.shape[0] % num_micro != 0:
                raise ValueError(
                    f"batch dim {x.shape[0]} not divisible by num_micro {num_micro}"
                )
            out[k] = x.reshape(num_micro, x.shape[0] // num_micro, *x.shape[1:])
    return out


def _flip_within_blocks(n: int, block: int) -> np.ndarray:
    """Permutation j(i) reversing each contiguous block (the reference's
    block_diag of flipped eyes, clip_bsgs_runner.py:372)."""
    i = np.arange(n)
    return (i // block) * block + (block - 1 - i % block)


def make_bsgs_grad_fn(
    model,
    num_micro: int,
    smoothing: float = 0.0,
    group_size: int = -1,
    mixup: bool = False,
    mixup_alpha_param: float = 0.2,
) -> Callable:
    """Returns grad_fn(params, batch, rng) -> (grads, metrics) computing the
    exact full-batch symmetric InfoNCE gradient via two scanned passes.

    group_size: negatives restricted to contiguous groups of this many
    samples (block-diagonal loss; the reference's group-limited gather).
    mixup: single-modality image mixup with the batch-reversed pairing
    *within each micro-batch* (so micro-batches stay self-contained, exactly
    the reference's per-GPU-batch flip).
    """

    def apply_micro(params, mbatch, key, lam=None):
        if lam is not None:
            mbatch = dict(mbatch)
            mbatch["image"] = (
                lam * mbatch["image"] + (1.0 - lam) * mbatch["image"][::-1]
            )
        rngs = {"dropout": key} if key is not None else None
        img, txt, temp = model.apply(
            params, mbatch, deterministic=key is None, rngs=rngs
        )
        return img.astype(jnp.float32), txt.astype(jnp.float32), temp

    def grad_fn(params, batch: Dict[str, jnp.ndarray],
                rng: Optional[jax.Array] = None, step=None):
        b = batch["image"].shape[0]
        mb_size = b // num_micro
        g = group_size if (group_size and 0 < group_size < b) else b
        if b % g != 0:
            raise ValueError(f"group_size {g} must divide batch {b}")
        if mixup and g % mb_size != 0 and g != b:
            raise ValueError(
                "mixup flip blocks (micro-batches) must nest inside "
                f"group_size groups: micro {mb_size}, group {g}"
            )
        ng = b // g

        micro = _split_micro(batch, num_micro)
        idx = jnp.arange(num_micro)

        lam = None
        if mixup:
            # key folded with MIXUP_FOLD_TAG (train_step.py) so it never
            # collides with the per-micro dropout keys key_of(0..num_micro)
            lam = mixup_lambda(rng, step, mixup_alpha_param)

        mask = batch.get("ignore_mask")
        w = (jnp.ones((b,), jnp.float32) if mask is None
             else 1.0 - mask.astype(jnp.float32))

        def key_of(i):
            return jax.random.fold_in(rng, i) if rng is not None else None

        # ---- pass 1: no-grad embeddings (clip_bsgs_runner.py:331-349)
        def fwd(_, inp):
            i, mb = inp
            img, txt, temp = apply_micro(params, mb, key_of(i), lam)
            return None, (img, txt, temp)

        _, (imgs, txts, temps) = jax.lax.scan(fwd, None, (idx, micro))
        img_g = jax.lax.stop_gradient(imgs.reshape(b, -1))
        txt_g = jax.lax.stop_gradient(txts.reshape(b, -1))
        temp = jax.lax.stop_gradient(temps[0])
        lam_sg = jax.lax.stop_gradient(lam) if lam is not None else None
        temp_sqrt = jnp.sqrt(temp)
        d = img_g.shape[-1]

        # masked feat2 rows are zeroed before the logits (info_nce parity)
        img_m = img_g * w[:, None]
        txt_m = txt_g * w[:, None]

        # group-blocked views (g == b -> single group == global negatives)
        i_blk = img_g.reshape(ng, g, d)
        t_blk = txt_g.reshape(ng, g, d)
        im_blk = img_m.reshape(ng, g, d)
        tm_blk = txt_m.reshape(ng, g, d)
        w_blk = w.reshape(ng, g)

        # ---- analytic softmax gradients (clip_bsgs_runner.py:358-396)
        s1 = jnp.einsum("gnd,gmd->gnm", i_blk, tm_blk,
                        preferred_element_type=jnp.float32) / temp
        s2 = jnp.einsum("gnd,gmd->gnm", t_blk, im_blk,
                        preferred_element_type=jnp.float32) / temp
        p1 = jax.nn.softmax(s1, axis=-1)  # per-group p_i2t
        p2 = jax.nn.softmax(s2, axis=-1)  # per-group p_t2i

        # soft targets Y per group: smoothing + mixup flip
        # (clip_bsgs_runner.py:371-376; CE is linear in the target, so
        # smoothing folds in as Y = (1-sm)*Y_mix + sm/g)
        eye = jnp.eye(g, dtype=jnp.float32)
        if mixup:
            flip = np.zeros((g, g), np.float32)
            # g >= mb_size is guaranteed by the group/micro divisibility
            # guard at the top of this function
            flip[np.arange(g), _flip_within_blocks(g, mb_size)] = 1.0
            y_mix = lam_sg * eye + (1.0 - lam_sg) * jnp.asarray(flip)
        else:
            y_mix = eye
        if smoothing > 0:
            y = (1.0 - smoothing) * y_mix + smoothing / g
        else:
            y = y_mix
        y = jnp.broadcast_to(y, (ng, g, g))

        a1 = p1 - y
        a2 = p2 - y
        # D-sandwich: dL/dI = (1/2B temp) diag(w)(A1 + A2^T)diag(w) T
        mid_i = (a1 + jnp.swapaxes(a2, 1, 2)) * w_blk[:, :, None] * w_blk[:, None, :]
        mid_t = (a2 + jnp.swapaxes(a1, 1, 2)) * w_blk[:, :, None] * w_blk[:, None, :]
        left_i = jnp.einsum("gnm,gmd->gnd", mid_i, t_blk,
                            preferred_element_type=jnp.float32) / temp_sqrt
        left_t = jnp.einsum("gnm,gmd->gnd", mid_t, i_blk,
                            preferred_element_type=jnp.float32) / temp_sqrt
        left_i = left_i.reshape(b, d)
        left_t = left_t.reshape(b, d)

        # loss value for logging (clip_bsgs_runner.py:369) — matches the
        # autodiff objective incl. masks/smoothing/mixup
        logp1 = jax.nn.log_softmax(s1, axis=-1)
        logp2 = jax.nn.log_softmax(s2, axis=-1)
        per_row1 = -jnp.sum(y * logp1, axis=-1) * w_blk
        per_row2 = -jnp.sum(y * logp2, axis=-1) * w_blk
        loss = 0.5 * (jnp.sum(per_row1) + jnp.sum(per_row2)) / b

        tgt = jnp.arange(g)
        hit1 = (jnp.argmax(s1, axis=-1) == tgt[None, :]).astype(jnp.float32)
        hit2 = (jnp.argmax(s2, axis=-1) == tgt[None, :]).astype(jnp.float32)
        denom = jnp.maximum(jnp.sum(w_blk), 1.0)
        i2t_acc = jnp.sum(hit1 * w_blk) / denom
        t2i_acc = jnp.sum(hit2 * w_blk) / denom

        left_i_m = left_i.reshape(num_micro, mb_size, -1)
        left_t_m = left_t.reshape(num_micro, mb_size, -1)

        # ---- pass 2: surrogate re-forward with grads (:404-438)
        def bwd(gacc, inp):
            i, mb, li, lt = inp

            def surrogate(p):
                img, txt, t2 = apply_micro(p, mb, key_of(i), lam)
                val = jnp.sum(li * img + lt * txt) / 2.0 / b
                return val / jnp.sqrt(t2)

            gr = jax.grad(surrogate)(params)
            return jax.tree.map(jnp.add, gacc, gr), None

        zeros = jax.tree.map(jnp.zeros_like, params)
        # pass 2 is differentiated: mark it so eligible (long-T) attention
        # shapes take the fused fwd+bwd kernel instead of the inference
        # kernel's einsum-rederived VJP (ops/attention.py). Pass 1 above is
        # grad-free and correctly keeps the inference routing.
        with attention_training():
            grads, _ = jax.lax.scan(bwd, zeros,
                                    (idx, micro, left_i_m, left_t_m))

        metrics = {
            "loss": loss,
            "temperature": temp,
            "i2t_acc": i2t_acc,
            "t2i_acc": t2i_acc,
        }
        return grads, metrics

    return grad_fn


def make_bsgs_train_step(
    model,
    tx: optax.GradientTransformation,
    set_lr: Callable,
    num_micro: int,
    mesh=None,
    smoothing: float = 0.0,
    group_size: int = -1,
    mixup: bool = False,
    mixup_alpha_param: float = 0.2,
    donate: bool = True,
    shard_opt_state: bool = False,
    opt_shard_min_size: int = 2**16,
    fsdp: bool = False,
    fsdp_min_size: int = 2**14,
):
    """Full BSGS train step (grad fn + optimizer), jitted; mirrors
    make_train_step's contract — including the factory form
    (factory(state) -> (step_fn, placed_state)) for ZeRO-1, tensor
    parallelism, and FSDP. BSGS composes with sharded towers naturally:
    the two scanned passes are ordinary pjit forwards (per-micro-batch
    data-sharded, params TP/FSDP-sharded — XLA inserts the tower
    collectives per micro-step), and the analytic middle section is
    sharding-agnostic global algebra on replicated (B, D) embeddings. This
    is the flagship big-batch x big-model combination: exact 16k-batch
    InfoNCE gradients on a tower too large to replicate."""
    grad_fn = make_bsgs_grad_fn(model, num_micro, smoothing,
                                group_size=group_size, mixup=mixup,
                                mixup_alpha_param=mixup_alpha_param)

    def step_fn(state: TrainState, batch, rng, lr):
        grads, metrics = grad_fn(state.params, batch, rng, step=state.step)
        opt_state = set_lr(state.opt_state, lr)
        updates, opt_state = tx.update(grads, opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = dict(metrics)
        metrics["grad_norm"] = optax.global_norm(grads)
        metrics["lr"] = lr
        return (
            state.replace(params=params, opt_state=opt_state, step=state.step + 1),
            metrics,
        )

    if mesh is None:
        return jax.jit(step_fn, donate_argnums=(0,) if donate else ())

    from jax.sharding import NamedSharding, PartitionSpec as P

    repl = NamedSharding(mesh, P())
    from simseg_tpu.parallel.mesh import MODEL_AXIS, data_sharding

    data = data_sharding(mesh)
    tp = MODEL_AXIS in mesh.axis_names
    # micro-batches keep the batch dim sharded: (num_micro, mb, ...) reshape
    # preserves the leading-axis layout across devices when mb is divisible
    # by the mesh size, so each scan step is a normal data-parallel forward.
    if shard_opt_state or tp or fsdp:
        from simseg_tpu.engine.train_step import derive_state_shardings

        def jit_with_state(state_template):
            sh = derive_state_shardings(
                state_template, mesh, tp=tp, fsdp=fsdp,
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
            return fn, jax.device_put(state_template, sh)

        return jit_with_state

    return jax.jit(
        step_fn,
        in_shardings=(repl, data, repl, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,) if donate else (),
    )
