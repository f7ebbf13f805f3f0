"""Pipeline parallelism: GPipe-style microbatch pipelining of the ViT block
stack over a ``pipe`` mesh axis.

Beyond-reference capability (SURVEY.md §2.8 marks PP absent upstream). The
TPU-native shape, per the scaling-book pipelining recipe:

- the per-block parameter subtrees (``blocks_0`` … ``blocks_{depth-1}``) are
  stacked along a leading layer dim and sharded over ``pipe`` so each stage
  physically holds only its own layers' weights inside the pipelined region,
- a ``shard_map`` over the ``pipe`` axis runs the classic GPipe schedule:
  stage 0 injects one microbatch per tick, every stage applies its layers
  (a ``lax.scan`` over the local layer dim), and activations hop to the next
  stage with ``lax.ppermute`` — point-to-point ICI traffic, no NCCL
  analogue needed,
- the last stage's outputs are returned to every stage with one ``psum``
  (masked so only the last stage contributes), keeping the result replicated
  over ``pipe`` for the downstream (projection + loss) compute.

The schedule is differentiable end-to-end: the transpose of ``ppermute`` is
the reverse permutation, so the backward pass pipelines in the opposite
direction automatically. Bubbles (``n_stages - 1`` ticks) compute on zeros
and their outputs never reach the collected buffer.

Storage note: outside the shard_map region the canonical parameter tree
stays in its normal (replicated or FSDP/ZeRO-sharded) placement — this
module pipelines *compute*; compose with ``fsdp_shardings`` to also shard
weight storage. Dropout inside the pipelined blocks is not supported (the
flagship config trains the towers without dropout); the executor always
runs the blocks deterministically.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from simseg_tpu.parallel.mesh import PIPE_AXIS, batch_axes


def stack_block_params(vit_params: Dict[str, Any], depth: int):
    """Stack the ``blocks_i`` subtrees into one pytree with a leading layer
    dim: leaf (…) -> (depth, …). Pure tree reshuffle — differentiable, and
    its transpose (unstack + accumulate) is what routes gradients back to
    the canonical per-block leaves."""
    blocks = [vit_params[f"blocks_{i}"] for i in range(depth)]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)


def pipeline_blocks(block_module, stacked, x: jnp.ndarray, mesh: Mesh,
                    n_micro: int) -> jnp.ndarray:
    """Run the stacked block parameters over ``x`` (B, T, D) with a GPipe
    schedule on the mesh's ``pipe`` axis.

    block_module: a ViTBlock instance (architecture only — params come from
    ``stacked``). stacked: pytree with leading dim ``depth`` (see
    stack_block_params); depth must divide by the pipe-axis size.
    """
    if PIPE_AXIS not in mesh.axis_names:
        raise ValueError("pipeline_blocks needs a 'pipe' mesh axis "
                         "(make_mesh(pp_size=...))")
    n_stages = mesh.shape[PIPE_AXIS]
    depth = jax.tree.leaves(stacked)[0].shape[0]
    if depth % n_stages != 0:
        raise ValueError(f"depth {depth} not divisible by pp_size {n_stages}")
    layers_per_stage = depth // n_stages
    shards = 1
    for ax in batch_axes(mesh):
        shards *= mesh.shape[ax]
    local = x.shape[0] // shards
    if x.shape[0] % shards != 0 or local % n_micro != 0:
        raise ValueError(
            f"per-device batch {x.shape[0]}/{shards} not divisible by "
            f"pp_micro {n_micro}")

    staged = jax.tree.map(
        lambda a: a.reshape((n_stages, layers_per_stage) + a.shape[1:]),
        stacked)
    baxes = batch_axes(mesh)
    x_spec = P(baxes if len(baxes) > 1 else (baxes[0] if baxes else None),
               None, None)
    in_specs = (jax.tree.map(lambda _: P(PIPE_AXIS), staged), x_spec)

    @partial(jax.shard_map, mesh=mesh, in_specs=in_specs, out_specs=x_spec,
             check_vma=False)
    def run(stage_params, xl):
        # local views: stage_params (1, L, …) -> (L, …); xl (b_local, T, D)
        stage_params = jax.tree.map(lambda a: a[0], stage_params)
        stage = jax.lax.axis_index(PIPE_AXIS)
        is_first = stage == 0
        is_last = stage == n_stages - 1
        mb = xl.reshape((n_micro, xl.shape[0] // n_micro) + xl.shape[1:])

        def apply_stage(h):
            def body(c, p):
                return block_module.apply({"params": p}, c, True), None

            h, _ = jax.lax.scan(body, h, stage_params)
            return h

        perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]
        cur = jnp.zeros_like(mb[0])
        buf = jnp.zeros_like(mb)
        for t in range(n_micro + n_stages - 1):
            if t < n_micro:
                cur = jnp.where(is_first, mb[t], cur)
            out = apply_stage(cur)
            k = t - (n_stages - 1)
            if k >= 0:
                buf = buf.at[k].set(jnp.where(is_last, out, buf[k]))
            if t < n_micro + n_stages - 2:
                cur = jax.lax.ppermute(out, PIPE_AXIS, perm)
        # only the last stage holds real outputs; one masked psum replicates
        # them across the pipe axis for the downstream loss compute
        buf = jnp.where(is_last, buf, jnp.zeros_like(buf))
        buf = jax.lax.psum(buf, PIPE_AXIS)
        return buf.reshape(xl.shape)

    return run(staged, x)


def _refuse_heterogeneous_tower(model) -> None:
    """The pipelined stage stack scans ONE homogeneous ViTBlock over stacked
    params, so towers whose blocks differ (MoE every-nth, token merging's
    shrinking sequence) cannot be expressed — and because neither feature
    adds required params to the plain block, running anyway would *silently*
    compute the non-MoE / non-merged forward. Refuse loudly instead (repo
    convention)."""
    if (int(dict(model.image_arch or ()).get("moe_experts", 0) or 0) > 0
            or int(dict(model.text_arch or ()).get("moe_experts", 0) or 0) > 0):
        raise NotImplementedError(
            "pipeline parallelism does not combine with MoE blocks (the "
            "stage stack needs homogeneous block params, and the pp forward "
            "would drop the MoE aux loss)")
    if int(dict(model.image_arch or ()).get("tome_r", 0) or 0) > 0:
        raise NotImplementedError(
            "pipeline parallelism does not combine with token merging "
            "(tome_r shrinks the token count per block; the pipelined "
            "stage stack needs a homogeneous sequence length)")


def pp_image_tokens(model, params, images: jnp.ndarray, mesh: Mesh,
                    n_micro: int) -> jnp.ndarray:
    """Pipelined ViT forward: embed (replicated) -> pipelined blocks ->
    final norm. Returns the full (B, 1+N, D) token sequence, numerically
    equal to ``model.image_encoder(images)``."""
    from simseg_tpu.models.vit import ViTBlock, resolve_vit_config

    _refuse_heterogeneous_tower(model)
    spec = resolve_vit_config(model.image_tag, dict(model.image_arch or ()))
    # quant is homogeneous across blocks (unlike MoE/tome), so it pipelines
    # fine; training with it is refused upstream (core/runner.py guard)
    block = ViTBlock(num_heads=spec["num_heads"],
                     mlp_ratio=spec.get("mlp_ratio", 4.0),
                     dropout=0.0, dtype=model.dtype,
                     quant=spec.get("quant", "none"))
    x = model.apply(params, images,
                    method=lambda m, im: m.image_encoder.embed(im, True))
    stacked = stack_block_params(params["params"]["image_encoder"],
                                 spec["depth"])
    x = pipeline_blocks(block, stacked, x, mesh, n_micro)
    return model.apply(params, x, method=lambda m, t: m.image_encoder.head(t))


def make_pp_forward(model, mesh: Mesh, n_micro: int):
    """CLIP forward with the image tower pipelined over ``pipe``:
    (params, batch) -> (image_emb, text_emb, temperature). Drop-in for the
    train step's model forward (engine/train_step.py clip_loss_fn
    ``forward_fn``); always deterministic (see module docstring)."""
    if "vit" not in model.image_tag:
        raise NotImplementedError(
            "pipeline parallelism is implemented for the ViT image tower")
    _refuse_heterogeneous_tower(model)
    if getattr(model, "dropout", 0.0) or (
            model.projection_name == "complex"
            and getattr(model, "projection_dropout", 0.0)):
        # refuse loudly rather than silently training without the
        # configured regularization (repo convention, cf. the clip_bsgs
        # guards in core/runner.py)
        raise NotImplementedError(
            "pipeline parallelism runs the forward deterministically; set "
            "model.dropout=0 (and complex-projection drop_out=0) or use "
            "dist.pp_size=1")

    def forward(params, batch) -> Tuple[jnp.ndarray, ...]:
        tokens = pp_image_tokens(model, params, batch["image"], mesh, n_micro)
        feat = tokens[:, 0] if model.pool_name == "identity" else tokens[:, 1:]
        img = model.apply(params, feat,
                          method=lambda m, f: m.forward_image_project(f, True))
        txt_feat = model.apply(
            params, batch["input_ids"], batch["attention_mask"],
            method=lambda m, i, a: m.forward_text_feature(i, a, True))
        txt = model.apply(
            params, txt_feat, batch["attention_mask"],
            method=lambda m, f, a: m.forward_text_project(f, a, True))
        temp = model.apply(params, method=lambda m: m.temperature())
        return img, txt, temp

    return forward
