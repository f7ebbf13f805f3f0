"""BSGS: exact big-batch contrastive gradients at micro-batch memory cost.

Parity: reference ``simseg/tasks/clip/clip_bsgs_runner.py:309-451``
(decoupled gradient accumulation): (1) a no-grad pass embeds the full batch
in micro-chunks, (2) analytic softmax gradients give per-sample "left"
matrices ``left_I = (p_i2t + p_t2i^T - 2y) @ E_text / sqrt(T)`` (:386-396),
(3) a re-forward pass backprops the surrogate
``sum(left . emb) / 2 / B / sqrt(T)`` per micro-batch (:404-438). The
reference re-seeds the RNG between the passes (``stable_random``,
:29-35, 310-312, 401-402) so dropout matches; JAX's explicit PRNG keys give
this for free (the same fold_in key is used in both passes).

TPU-native shape: both passes are ``lax.scan`` over micro-batches inside one
jit; the analytic middle section is pure global matrix algebra on the MXU.
Under a mesh each micro-batch is itself data-sharded, so the scan composes
with pjit: XLA all-gathers embeddings once per micro-step over ICI.

The surrogate's gradient equals the true InfoNCE gradient for *all*
parameters including the learnable temperature: d(surrogate)/dT through the
re-forward's 1/sqrt(T) factor reproduces dL/dT = -(1/2BT^2) sum (p+q-2y)*s
(verified by test_bsgs.py against direct autodiff).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax

from simseg_tpu.engine.train_step import TrainState

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


def make_bsgs_grad_fn(
    model,
    num_micro: int,
    smoothing: float = 0.0,
) -> Callable:
    """Returns grad_fn(params, batch, rng) -> (grads, metrics) computing the
    exact full-batch symmetric InfoNCE gradient via two scanned passes."""

    def apply_micro(params, mbatch, key):
        rngs = {"dropout": key} if key is not None else None
        img, txt, temp = model.apply(
            params, mbatch, deterministic=key is None, rngs=rngs
        )
        return img.astype(jnp.float32), txt.astype(jnp.float32), temp

    def grad_fn(params, batch: Dict[str, jnp.ndarray], rng: Optional[jax.Array] = None):
        b = batch["image"].shape[0]
        micro = _split_micro(batch, num_micro)
        idx = jnp.arange(num_micro)

        def key_of(i):
            return jax.random.fold_in(rng, i) if rng is not None else None

        # ---- pass 1: no-grad embeddings (clip_bsgs_runner.py:331-349)
        def fwd(_, inp):
            i, mb = inp
            img, txt, temp = apply_micro(params, mb, key_of(i))
            return None, (img, txt, temp)

        _, (imgs, txts, temps) = jax.lax.scan(fwd, None, (idx, micro))
        img_g = jax.lax.stop_gradient(imgs.reshape(b, -1))
        txt_g = jax.lax.stop_gradient(txts.reshape(b, -1))
        temp = jax.lax.stop_gradient(temps[0])
        temp_sqrt = jnp.sqrt(temp)

        # ---- analytic softmax gradients (clip_bsgs_runner.py:358-396)
        s = jnp.dot(img_g, txt_g.T, preferred_element_type=jnp.float32) / temp
        p_i2t = jax.nn.softmax(s, axis=1)
        p_t2i_t = jax.nn.softmax(s, axis=0)  # = p_t2i transposed: (i, t)

        eye = jnp.eye(b, dtype=jnp.float32)
        if smoothing > 0:
            y = (1.0 - smoothing) * eye + smoothing / b
        else:
            y = eye

        left_i = jnp.dot(p_i2t + p_t2i_t - 2.0 * y, txt_g,
                         preferred_element_type=jnp.float32) / temp_sqrt
        left_t = jnp.dot(p_i2t.T + p_t2i_t.T - 2.0 * y, img_g,
                         preferred_element_type=jnp.float32) / temp_sqrt

        # loss value for logging (clip_bsgs_runner.py:369)
        tgt = jnp.arange(b)
        logp_rows = jax.nn.log_softmax(s, axis=1)
        logp_cols = jax.nn.log_softmax(s.T, axis=1)
        loss = -0.5 * (
            jnp.mean(jnp.take_along_axis(logp_rows, tgt[:, None], 1))
            + jnp.mean(jnp.take_along_axis(logp_cols, tgt[:, None], 1))
        )
        i2t_acc = jnp.mean((jnp.argmax(s, axis=1) == tgt).astype(jnp.float32))
        t2i_acc = jnp.mean((jnp.argmax(s, axis=0) == tgt).astype(jnp.float32))

        mb_size = b // num_micro
        left_i_m = left_i.reshape(num_micro, mb_size, -1)
        left_t_m = left_t.reshape(num_micro, mb_size, -1)

        # ---- pass 2: surrogate re-forward with grads (:404-438)
        def bwd(gacc, inp):
            i, mb, li, lt = inp

            def surrogate(p):
                img, txt, t2 = apply_micro(p, mb, key_of(i))
                val = jnp.sum(li * img + lt * txt) / 2.0 / b
                return val / jnp.sqrt(t2)

            g = jax.grad(surrogate)(params)
            return jax.tree.map(jnp.add, gacc, g), None

        zeros = jax.tree.map(jnp.zeros_like, params)
        grads, _ = jax.lax.scan(bwd, zeros, (idx, micro, left_i_m, left_t_m))

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
    donate: bool = True,
):
    """Full BSGS train step (grad fn + optimizer), jitted; mirrors
    make_train_step's contract."""
    grad_fn = make_bsgs_grad_fn(model, num_micro, smoothing)

    def step_fn(state: TrainState, batch, rng, lr):
        grads, metrics = grad_fn(state.params, batch, rng)
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
    data = NamedSharding(mesh, P(mesh.axis_names))
    # micro-batches keep the batch dim sharded: (num_micro, mb, ...) reshape
    # preserves the leading-axis layout across devices when mb is divisible
    # by the mesh size, so each scan step is a normal data-parallel forward.
    return jax.jit(
        step_fn,
        in_shardings=(repl, data, repl, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,) if donate else (),
    )
