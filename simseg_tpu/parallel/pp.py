"""Pipeline parallelism: GPipe-style microbatch pipelining of BOTH tower
block stacks (ViT and BERT) over a ``pipe`` mesh axis.

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


def stack_block_params(tower_params: Dict[str, Any], depth: int,
                       prefix: str = "blocks_"):
    """Stack the ``{prefix}i`` subtrees into one pytree with a leading layer
    dim: leaf (…) -> (depth, …). Pure tree reshuffle — differentiable, and
    its transpose (unstack + accumulate) is what routes gradients back to
    the canonical per-block leaves. prefix: ``blocks_`` for the ViT tower,
    ``layer_`` for BERT."""
    blocks = [tower_params[f"{prefix}{i}"] for i in range(depth)]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)


def pipeline_blocks(block_module, stacked, x: jnp.ndarray, mesh: Mesh,
                    n_micro: int, aux=None, block_apply=None) -> jnp.ndarray:
    """Run the stacked block parameters over ``x`` (B, T, D) with a GPipe
    schedule on the mesh's ``pipe`` axis.

    block_module: a ViTBlock/BertLayer instance (architecture only — params
    come from ``stacked``). stacked: pytree with leading dim ``depth`` (see
    stack_block_params); depth must divide by the pipe-axis size.

    aux: optional pytree of PER-SAMPLE side inputs (leading dim B, e.g. the
    BERT padding bias) that every stage needs alongside the activations.
    Since aux is replicated over ``pipe``, it is not permuted with the
    activations: each stage dynamically selects the microbatch it is
    processing at tick t (index t - stage; clipped — bubble outputs never
    land in the collected buffer).

    block_apply(module, layer_params, h, aux_mb) -> h applies one layer;
    defaults to the ViTBlock signature ``module.apply({'params': p}, h,
    deterministic=True)``.
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

    if block_apply is None:
        def block_apply(module, p, h, _aux):
            return module.apply({"params": p}, h, True)

    staged = jax.tree.map(
        lambda a: a.reshape((n_stages, layers_per_stage) + a.shape[1:]),
        stacked)
    baxes = batch_axes(mesh)
    batch_spec = baxes if len(baxes) > 1 else (baxes[0] if baxes else None)
    x_spec = P(batch_spec, None, None)
    aux_specs = jax.tree.map(
        lambda a: P(batch_spec, *([None] * (a.ndim - 1))), aux)
    in_specs = (jax.tree.map(lambda _: P(PIPE_AXIS), staged), x_spec,
                aux_specs)

    @partial(jax.shard_map, mesh=mesh, in_specs=in_specs, out_specs=x_spec,
             check_vma=False)
    def run(stage_params, xl, auxl):
        # local views: stage_params (1, L, …) -> (L, …); xl (b_local, T, D)
        stage_params = jax.tree.map(lambda a: a[0], stage_params)
        stage = jax.lax.axis_index(PIPE_AXIS)
        is_first = stage == 0
        is_last = stage == n_stages - 1
        mb = xl.reshape((n_micro, xl.shape[0] // n_micro) + xl.shape[1:])
        aux_mb = jax.tree.map(
            lambda a: a.reshape((n_micro, a.shape[0] // n_micro) + a.shape[1:]),
            auxl)

        def apply_stage(h, a):
            def body(c, p):
                return block_apply(block_module, p, c, a), None

            h, _ = jax.lax.scan(body, h, stage_params)
            return h

        perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]
        cur = jnp.zeros_like(mb[0])
        buf = jnp.zeros_like(mb)
        for t in range(n_micro + n_stages - 1):
            if t < n_micro:
                cur = jnp.where(is_first, mb[t], cur)
            # the microbatch this stage processes at tick t entered the pipe
            # at tick t - stage; bubbles (out-of-range, clipped) compute on
            # zeros and never reach the collected buffer
            mb_idx = jnp.clip(t - stage, 0, n_micro - 1)
            a_t = jax.tree.map(
                lambda a: jax.lax.dynamic_index_in_dim(
                    a, mb_idx, axis=0, keepdims=False), aux_mb)
            out = apply_stage(cur, a_t)
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

    return run(staged, x, aux)


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
    arch = dict(model.image_arch or ())
    if (int(arch.get("tome_r", 0) or 0) > 0
            or any(int(r) > 0 for r in arch.get("tome_schedule") or ())):
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


def pp_text_feature(model, params, input_ids: jnp.ndarray,
                    attention_mask, mesh: Mesh, n_micro: int) -> jnp.ndarray:
    """Pipelined BERT forward: embeddings (replicated) -> pipelined layers.
    Returns the last hidden state (B, T, D), numerically equal to
    ``model.forward_text_feature(input_ids, attention_mask)``. The padding
    bias rides the schedule as a per-microbatch aux input (BertLayer needs
    it at every stage)."""
    from simseg_tpu.models.bert import BertLayer, resolve_bert_config
    from simseg_tpu.ops.attention import padding_bias

    _refuse_heterogeneous_tower(model)
    spec = resolve_bert_config(model.text_tag, dict(model.text_arch or ()))
    layer = BertLayer(num_heads=spec["num_heads"],
                      intermediate_dim=spec["intermediate_dim"],
                      dropout=0.0, dtype=model.dtype,
                      quant=dict(model.text_arch or ()).get("quant", "none"))
    x = model.apply(
        params, input_ids,
        method=lambda m, i: m.text_encoder.embed(i, None, True))
    bias = None
    if attention_mask is not None:
        bias = padding_bias(attention_mask, jnp.float32)
    stacked = stack_block_params(params["params"]["text_encoder"],
                                 spec["depth"], prefix="layer_")
    return pipeline_blocks(
        layer, stacked, x, mesh, n_micro, aux=bias,
        block_apply=lambda mod, p, h, a: mod.apply({"params": p}, h, a, True))


def make_pp_forward(model, mesh: Mesh, n_micro: int):
    """CLIP forward with BOTH towers pipelined over ``pipe`` (sequential
    pipelined regions sharing the stage mesh — each tower's block stack is
    stage-sharded, so pp=2 halves the resident block weights of the WHOLE
    196M flagship, not just the ViT's 86M):
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
        txt_feat = pp_text_feature(model, params, batch["input_ids"],
                                   batch["attention_mask"], mesh, n_micro)
        txt = model.apply(
            params, txt_feat, batch["attention_mask"],
            method=lambda m, f, a: m.forward_text_project(f, a, True))
        temp = model.apply(params, method=lambda m: m.temperature())
        return img, txt, temp

    return forward
