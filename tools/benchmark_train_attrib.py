"""Train-step time attribution (single chip).

Decomposes the flagship CLIP train step (ViT-B/16 @288 + BERT-base, bf16
towers, f32 AdamW) into separately-jitted phases so the gap between the
measured step MFU and the towers' own efficiency can be attributed instead
of guessed at (round-2 VERDICT weak #3). Methodology: chained scalar
accumulator per trial (see CLAUDE.md — block_until_ready can return early
through the axon tunnel).

Phases (per-sample ms at --batch):
- loss_fwd        : full contrastive loss forward (both towers + NCE)
- grads           : jax.value_and_grad of the same (fwd + bwd)
- image_fwd_bwd   : image tower + projection only, fwd + bwd
- text_fwd_bwd    : text tower + projection only, fwd + bwd
- optimizer       : AdamW update + apply on precomputed grads (HBM-bound:
                    ~7 f32 passes over the ~195M params)
- full_step       : the production make_train_step (everything fused)

Also prints the compiled full step's XLA cost analysis (flops, bytes
accessed) vs the analytic dense-matmul count — surplus flops or bytes
locate recompute/casting overheads.

Usage: python tools/benchmark_train_attrib.py [--batch 32] [--iters 10]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax


from bench_common import timed_secs as timed_acc  # noqa: E402
from bench_common import tower_flops  # noqa: E402


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=32)
    parser.add_argument("--iters", type=int, default=10)
    args = parser.parse_args()
    b = args.batch

    from simseg_tpu.core.optim import build_optimizer
    from simseg_tpu.engine import TrainState, make_train_step
    from simseg_tpu.engine.train_step import clip_loss_fn
    from simseg_tpu.models.clip import CLIPModel
    from simseg_tpu.utils.collections import AttrDict, OpenDict

    model = CLIPModel(
        image_tag="vit_base_patch16_224_in21k", img_size=288,
        text_tag="bert-base-uncased", projection_name="simple",
        projection_dim=512, pool_name="loda", image_k=5, text_k=1,
        temperature_name="parameter", temperature_init=0.02,
        dtype=jnp.bfloat16,
    )
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.normal(size=(b, 288, 288, 3)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, 30522, (b, 25)).astype(np.int32))
    mask = jnp.ones((b, 25), jnp.int32)
    batch = {"image": images, "input_ids": ids, "attention_mask": mask}
    init_batch = {k: v[:1] for k, v in batch.items()}
    params = model.init(jax.random.key(0), init_batch)
    n_params = sum(x.size for x in jax.tree.leaves(params))

    results = {}

    @jax.jit
    def loss_fwd(p, bt, acc):
        loss, _ = clip_loss_fn(model, p, bt, None)
        return acc + loss

    results["loss_fwd"] = timed_acc(loss_fwd, (params, batch), args.iters)

    @jax.jit
    def grads_fn(p, bt, acc):
        g = jax.grad(lambda pp: clip_loss_fn(model, pp, bt, None)[0])(p)
        return acc + optax.global_norm(g)

    results["grads"] = timed_acc(grads_fn, (params, batch), args.iters)

    @jax.jit
    def image_fwd_bwd(p, x, acc):
        def f(pp):
            t = model.apply(pp, x,
                            method=lambda m, im: m.forward_image_tokens(im))
            e = model.apply(pp, t[:, 1:],
                            method=lambda m, tt: m.forward_image_project(tt))
            return jnp.sum(e.astype(jnp.float32))
        g = jax.grad(f)(p)
        return acc + optax.global_norm(g)

    results["image_fwd_bwd"] = timed_acc(image_fwd_bwd, (params, images),
                                         args.iters)

    @jax.jit
    def text_fwd_bwd(p, i, m, acc):
        def f(pp):
            h = model.apply(pp, i, m,
                            method=lambda mm, a, c: mm.forward_text_feature(a, c))
            e = model.apply(pp, h, m,
                            method=lambda mm, t, c: mm.forward_text_project(t, c))
            return jnp.sum(e.astype(jnp.float32))
        g = jax.grad(f)(p)
        return acc + optax.global_norm(g)

    results["text_fwd_bwd"] = timed_acc(text_fwd_bwd, (params, ids, mask),
                                        args.iters)

    cfg = AttrDict()
    cfg.optim = AttrDict()
    cfg.optim.name = "torch.optim.AdamW"
    cfg.optim.param = OpenDict(betas=(0.9, 0.98), eps=1e-6, weight_decay=0.001)
    cfg.optim.param_group_rules = OpenDict()
    cfg.optim.grad_clip = OpenDict()
    tx, set_lr = build_optimizer(cfg, params)
    state = TrainState.create(params, tx)

    grads_once = jax.jit(
        lambda p: jax.grad(lambda pp: clip_loss_fn(model, pp, batch, None)[0])(p)
    )(params)
    jax.block_until_ready(grads_once)

    @jax.jit
    def opt_only(st, g, acc):
        opt_state = set_lr(st.opt_state, 1e-4)
        updates, opt_state = tx.update(g, opt_state, st.params)
        p = optax.apply_updates(st.params, updates)
        # the checksum must depend on EVERY updated leaf AND the new
        # moments, or XLA dead-code-eliminates the bulk of the AdamW work
        # (a single-leaf checksum measured near-zero here)
        return (acc + optax.global_norm(p)
                + optax.global_norm([x for x in jax.tree.leaves(opt_state)
                                     if hasattr(x, "dtype")
                                     and jnp.issubdtype(x.dtype,
                                                        jnp.floating)]))

    results["optimizer"] = timed_acc(opt_only, (state, grads_once), args.iters)

    step = make_train_step(model, tx, set_lr, donate=False)
    # production form: the runner's step donates the TrainState, letting XLA
    # update params/moments in place — measured materially faster than the
    # non-donating phase probes above, so report both
    step_donate = make_train_step(model, tx, set_lr, donate=True)

    def full_trial(fn, s):
        t0 = time.perf_counter()
        for i in range(args.iters):
            s, metrics = fn(s, batch, None, 1e-4)
        # sync on the STATE, not just the loss: metrics['loss'] has no
        # data dependency on the final iteration's optimizer apply, so a
        # loss-only sync would let one update per trial escape the timed
        # window in the restarted (nodonate) lane while the chained
        # donated lane absorbs it — biasing the donation delta
        float(metrics["loss"])
        # scalar D2H fetch (not block_until_ready — unreliable through the
        # axon tunnel, see CLAUDE.md)
        float(jnp.sum(jax.tree.leaves(s.params)[0]).astype(jnp.float32))
        return (time.perf_counter() - t0) / args.iters, s

    full_trial(step, state)  # compile + warm
    results["full_step_nodonate"] = float(np.median(
        [full_trial(step, state)[0] for _ in range(3)]))
    # donated lane: thread the state through (each call consumes its input)
    _, s_live = full_trial(step_donate, state)  # compile + warm
    donate_secs = []
    for _ in range(3):
        sec, s_live = full_trial(step_donate, s_live)
        donate_secs.append(sec)
    results["full_step"] = float(np.median(donate_secs))

    print(f"\n== train-step attribution (batch {b}) ==")
    for k, v in results.items():
        print(f"{k:16s} {1e3 * v:8.2f} ms/step   {b / v:8.1f} img/s")
    bwd = results["grads"] - results["loss_fwd"]
    resid = (results["full_step_nodonate"] - results["grads"]
             - results["optimizer"])
    print(f"\nfwd {1e3 * results['loss_fwd']:.2f} ms + bwd {1e3 * bwd:.2f} ms "
          f"+ opt {1e3 * results['optimizer']:.2f} ms; "
          f"residual(nodonate full - grads - opt) {1e3 * resid:.2f} ms; "
          f"donation saves "
          f"{1e3 * (results['full_step_nodonate'] - results['full_step']):.2f} ms")
    print(f"params: {n_params / 1e6:.1f} M; AdamW traffic ~ "
          f"{7 * 4 * n_params / 1e9:.2f} GB/step "
          f"(v5e ~819 GB/s -> {1e3 * 7 * 4 * n_params / 819e9:.2f} ms floor)")

    # compiled-step cost analysis vs analytic matmul flops (donated form —
    # what the runner executes)
    lowered = step_donate.lower(state, batch, None, 1e-4)
    cost = lowered.compile().cost_analysis()
    if cost:
        flops = cost.get("flops", float("nan"))
        bytes_ = cost.get("bytes accessed", float("nan"))
        vit = tower_flops(325, 768, 12,
                          extra=325 * 768 * (3 * 256) + 325 * 768 * 512)
        bert = tower_flops(25, 768, 12, extra=25 * 768 * 512)
        analytic = 3.0 * b * (vit + bert)
        print(f"XLA cost analysis: {flops / 1e12:.3f} TFLOP/step "
              f"(analytic 3x-fwd {analytic / 1e12:.3f}), "
              f"{bytes_ / 1e9:.2f} GB accessed/step")


if __name__ == "__main__":
    main()
