"""Vision Transformer returning the full token sequence.

Parity: reference ``simseg/models/backbones/mml/vit_builder.py:8-27`` — a
timm ViT whose forward is re-implemented to return the complete (B, 1+N, D)
token sequence (CLS + patches) for dense zero-shot segmentation, and the timm
``vit_{small,base}_patch16_224(_in21k)`` architectures it instantiates
(patch-embed conv, learned CLS + position embeddings, pre-LN blocks with
fused-qkv attention, final LayerNorm, LN eps 1e-6, exact GELU).

TPU-first notes:
- everything is static-shaped and jit-compiled; attention is one fused
  einsum chain XLA maps onto the MXU (sequences here are ~325 tokens, far
  below the regime where a Pallas flash kernel wins)
- compute dtype is configurable (bf16 on TPU for throughput; f32 for
  numerics tests); params stay f32.
"""

from __future__ import annotations

import re
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from simseg_tpu.ops.attention import multi_head_attention


def _remat_policy(name: str):
    import jax

    if name in (None, "none", ""):
        return None
    if name == "dots":
        return jax.checkpoint_policies.dots_with_no_batch_dims_saveable
    raise NotImplementedError(f"remat_policy '{name}'")


class ViTMlp(nn.Module):
    hidden_dim: int
    out_dim: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    # int8 PTQ inference (ops/quant.py): '' | 'none' | 'int8' | 'int8_static'
    quant: str = "none"

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        from simseg_tpu.ops.quant import dense_cls

        dense = dense_cls(self.quant)
        x = dense(self.hidden_dim, dtype=self.dtype, name="fc1")(x)
        # exact erf-GELU matches torch bit-for-bit in f32 (parity tests);
        # in bf16 the tanh approximation's ~1e-3 error sits below bf16
        # rounding and the erf is a measured VPU bottleneck (+33% ViT fwd)
        x = nn.gelu(x, approximate=self.dtype != jnp.float32)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = dense(self.out_dim, dtype=self.dtype, name="fc2")(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return x


class ViTAttention(nn.Module):
    """Pre-LN multi-head self-attention with a fused qkv projection
    (timm layout: one Dense D->3D so the torch ``qkv.weight`` maps 1:1)."""

    num_heads: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    # int8 PTQ inference (ops/quant.py): the qkv/proj matmuls quantize; the
    # score/probability einsums stay in the compute dtype (their FLOPs are
    # small at ViT sequence lengths and probs are already <= 1)
    quant: str = "none"

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True,
                 attention_bias=None, return_keys: bool = False):
        from simseg_tpu.ops.quant import dense_cls

        dense = dense_cls(self.quant)
        b, t, d = x.shape
        qkv = dense(3 * d, dtype=self.dtype, name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        out = multi_head_attention(q, k, v, self.num_heads,
                                   attention_bias=attention_bias,
                                   dtype=self.dtype)
        out = dense(d, dtype=self.dtype, name="proj")(out)
        out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        if return_keys:
            # token-merging similarity metric: attention keys, mean over
            # heads (ToMe's best-performing metric)
            hd = d // self.num_heads
            return out, k.reshape(b, t, self.num_heads, hd).mean(axis=2)
        return out


class ViTBlock(nn.Module):
    num_heads: int
    mlp_ratio: float = 4.0
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    # mixture-of-experts MLP (beyond reference, ops/moe.py): when
    # moe_experts > 0 the block's FFN becomes a Switch-style top-1 MoE
    moe_experts: int = 0
    moe_capacity: float = 1.25
    expert_sharding: Optional[Any] = None
    # token merging (beyond reference, ops/tome.py): merge the tome_r most
    # similar token pairs between attention and MLP. When set, the block's
    # input/output is the carry tuple (x, sizes, gather_map) instead of x —
    # same positional signature, so the remat wrapper's static_argnums is
    # unchanged.
    tome_r: int = 0
    # member of a tome chain even when this block itself merges nothing
    # (tome_r == 0): threads the carry tuple and applies the proportional-
    # attention bias. Schedules with fewer, larger merges set this so the
    # non-merging blocks still see the merged sizes (models/vit.py
    # VisionTransformer.tome_schedule).
    tome_chain: bool = False
    # no merge has happened before this block: sizes are statically
    # all-ones, so the proportional-attention bias is identically zero —
    # pass None instead, keeping the block eligible for the bias-free flash
    # kernels (every gate in ops/flash_attention.py requires
    # attention_bias=None)
    tome_first: bool = False
    # int8 PTQ inference (ops/quant.py, beyond reference): qkv/proj/fc1/fc2
    # run int8 x int8 -> int32 on the MXU. Inference only — the runner
    # refuses it under training.
    quant: str = "none"

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        from simseg_tpu.ops.tome import (bipartite_merge, size_bias,
                                         update_gather_map)

        sizes = gather_map = attn_bias = None
        in_chain = self.tome_chain or self.tome_r > 0
        if in_chain:
            if not (isinstance(x, tuple) and len(x) == 3):
                raise TypeError(
                    "ViTBlock(tome) takes the (x, sizes, gather_map) "
                    f"carry tuple, got {type(x).__name__}"
                )
            x, sizes, gather_map = x
            # proportional attention: softmax mass ~ merged-group size
            if not self.tome_first:
                attn_bias = size_bias(sizes, self.dtype)
        d = x.shape[-1]
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        attn = ViTAttention(self.num_heads, self.dropout, self.dtype,
                            quant=self.quant, name="attn")
        if self.tome_r > 0:
            attn_out, keys = attn(y, deterministic, attention_bias=attn_bias,
                                  return_keys=True)
            x = x + attn_out
            x, sizes, old2new = bipartite_merge(x, sizes, keys, self.tome_r)
            gather_map = update_gather_map(gather_map, old2new)
        elif in_chain:
            x = x + attn(y, deterministic, attention_bias=attn_bias)
        else:
            x = x + attn(y, deterministic)
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        if self.moe_experts > 0:
            from simseg_tpu.ops.moe import MoEMlp

            mlp_out = MoEMlp(self.moe_experts, int(d * self.mlp_ratio), d,
                             self.moe_capacity, self.dtype,
                             self.expert_sharding, name="moe")(y, deterministic)
        else:
            mlp_out = ViTMlp(int(d * self.mlp_ratio), d, self.dropout,
                             self.dtype, quant=self.quant,
                             name="mlp")(y, deterministic)
        x = x + mlp_out
        if in_chain:
            return x, sizes, gather_map
        return x


class VisionTransformer(nn.Module):
    """ViT returning the full (B, 1+N, D) token sequence.

    img_size is the runtime input resolution; position embeddings are sized
    for it directly (the checkpoint bridge interpolates 224-px checkpoints to
    other grids, parity: utils/interpolate_pe.py).
    """

    img_size: int = 224
    patch_size: int = 16
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    # rematerialize block activations in the backward pass (trade FLOPs for
    # HBM — enables the reference's 1024+ contrastive batches on one chip).
    # remat_policy 'dots' saves matmul outputs and recomputes only the
    # cheap elementwise ops (jax.checkpoint_policies
    # .dots_with_no_batch_dims_saveable) — much faster backward than full
    # remat at moderate extra memory
    remat: bool = False
    remat_policy: str = "none"  # none | dots
    # mixture-of-experts (beyond reference, ops/moe.py): every
    # ``moe_every``-th block's FFN becomes a top-1 MoE with
    # ``moe_experts`` experts; expert_sharding shards the (E, C, D)
    # buffers over the expert-parallel mesh axis
    moe_experts: int = 0
    moe_every: int = 2
    moe_capacity: float = 1.25
    expert_sharding: Optional[Any] = None
    # token merging (beyond reference, ops/tome.py): every block merges the
    # tome_r most similar token pairs (325 -> 133 tokens over 12 blocks at
    # r=16), cutting attention+MLP cost as depth grows; the tower unmerges
    # at the end so the (B, 1+N, D) output contract is unchanged (merged
    # groups share a feature row). Opt-in quality/speed trade — enable via
    # model.image_encoder.arch="{'tome_r': 16}". Not supported under
    # pipeline parallelism (stage stacks need homogeneous token counts).
    tome_r: int = 0
    # per-block merge schedule overriding the uniform tome_r (tuple of
    # ``depth`` ints; 0 = no merge at that block). Fewer, larger merges
    # (e.g. (48,0,0)*4: 325 -> 277 -> 229 -> 181 -> 133) keep the same
    # final token count but cut the number of DISTINCT block shapes from
    # ``depth`` to ~4 — the cold-compile cost of the composed
    # ToMe+int8 lane scales with distinct (T, quant) shape classes, not
    # block instances (round-4 smoke: 12 uniform-T int8 blocks compiled
    # in <900 s, 12 distinct-T int8 blocks took ~30 min). Enable via
    # model.image_encoder.arch="{'tome_schedule': (48,0,0,48,0,0,...)}".
    tome_schedule: Optional[Tuple[int, ...]] = None
    # int8 PTQ inference (beyond reference, ops/quant.py): every block's
    # qkv/proj/fc1/fc2 matmul runs int8 x int8 -> int32 on the MXU (2x the
    # bf16 peak on v5e) with per-channel weight + dynamic per-token
    # activation scales. Param tree is unchanged (f32 master weights;
    # quantization is a forward transform), so any checkpoint loads. Opt in
    # via model.image_encoder.arch="{'quant': 'int8'}". Inference only.
    quant: str = "none"
    # sequence parallelism (beyond reference): a NamedSharding for the
    # (B, T, D) residual stream, token dim sharded over the tensor-parallel
    # 'model' mesh axis. Constraining between blocks lets GSPMD run the
    # LayerNorm/residual elementwise work token-sharded and place the
    # all-gather (into qkv) / reduce-scatter (after proj) at the block
    # boundaries — Megatron-SP, derived by the compiler from one annotation.
    act_sharding: Optional[Any] = None

    @property
    def tome_on(self) -> bool:
        return self.tome_r > 0 or bool(self.tome_schedule)

    @property
    def tome_plan(self) -> Tuple[int, ...]:
        """Per-block merge counts: the explicit schedule, else uniform
        tome_r. Validated against depth."""
        if self.tome_schedule:
            sched = tuple(int(r) for r in self.tome_schedule)
            if len(sched) != self.depth:
                raise ValueError(
                    f"tome_schedule has {len(sched)} entries for a "
                    f"depth-{self.depth} tower")
            if any(r < 0 for r in sched):
                raise ValueError(f"tome_schedule entries must be >= 0: {sched}")
            return sched
        return (self.tome_r,) * self.depth if self.tome_r > 0 else (0,) * self.depth

    @property
    def grid_size(self) -> int:
        return self.img_size // self.patch_size

    @property
    def num_patches(self) -> int:
        return self.grid_size * self.grid_size

    def setup(self) -> None:
        # setup-style (rather than @nn.compact) so ``embed``/``head`` are
        # callable as standalone stages — the pipeline-parallel executor
        # (parallel/pp.py) runs embed -> pipelined blocks -> head. Param
        # names are identical to the former compact layout (checkpoint
        # bridge compatibility).
        self.patch_embed = nn.Conv(
            self.embed_dim,
            kernel_size=(self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            padding="VALID",
            dtype=self.dtype,
            name="patch_embed",
        )
        self.cls_token = self.param(
            "cls_token", nn.initializers.zeros, (1, 1, self.embed_dim), jnp.float32
        )
        self.pos_embed = self.param(
            "pos_embed",
            nn.initializers.normal(stddev=0.02),
            (1, 1 + self.num_patches, self.embed_dim),
            jnp.float32,
        )
        self.pos_drop = nn.Dropout(self.dropout)
        block_cls = ViTBlock
        if self.remat:
            block_cls = nn.remat(ViTBlock, static_argnums=(2,),
                                 policy=_remat_policy(self.remat_policy))
        def is_moe(i: int) -> bool:
            return (self.moe_experts > 0
                    and i % self.moe_every == self.moe_every - 1)

        sched = self.tome_plan
        self.blocks = [
            block_cls(self.num_heads, self.mlp_ratio, self.dropout, self.dtype,
                      moe_experts=self.moe_experts if is_moe(i) else 0,
                      moe_capacity=self.moe_capacity,
                      expert_sharding=self.expert_sharding,
                      tome_r=sched[i],
                      tome_chain=self.tome_on,
                      tome_first=(self.tome_on and sum(sched[:i]) == 0),
                      quant=self.quant,
                      name=f"blocks_{i}")
            for i in range(self.depth)
        ]
        self.norm = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")

    def embed(self, images: jnp.ndarray,
              deterministic: bool = True) -> jnp.ndarray:
        """Patch embedding + CLS + position embeddings: (B,H,W,3) -> (B,1+N,D)."""
        b = images.shape[0]
        x = self.patch_embed(images.astype(self.dtype))
        x = x.reshape(b, -1, self.embed_dim)  # (B, N, D)
        pos_embed = self.pos_embed
        n_tokens = x.shape[1]
        if n_tokens != self.num_patches:
            # variable input resolution (multi-scale inference): resample the
            # position grid bicubically (parity: utils/interpolate_pe.py,
            # applied at trace time — shapes are static per call)
            from simseg_tpu.ops.interpolate_pe import interpolate_pos_embed

            pos_embed = interpolate_pos_embed(pos_embed, n_tokens)
        x = jnp.concatenate(
            [jnp.tile(self.cls_token.astype(self.dtype), (b, 1, 1)), x], axis=1)
        x = x + pos_embed.astype(self.dtype)
        return self.pos_drop(x, deterministic=deterministic)

    def head(self, x: jnp.ndarray) -> jnp.ndarray:
        """Final LayerNorm after the block stack."""
        return self.norm(x)

    def _constrain(self, y):
        import jax

        # only under jit: the compiler pads an indivisible token dim
        # (T=325 over tp=2), while in eager (model.init) the constraint
        # would be a strict device_put and reject it
        if self.act_sharding is not None and isinstance(y, jax.core.Tracer):
            return jax.lax.with_sharding_constraint(y, self.act_sharding)
        return y

    def __call__(self, images: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        """images: (B, H, W, 3) NHWC float. Returns (B, 1+N, D)."""
        x = self._constrain(self.embed(images, deterministic))
        if self.tome_on:
            from simseg_tpu.ops.tome import unmerge

            b, t = x.shape[:2]
            sizes = jnp.ones((b, t), jnp.float32)
            gather_map = jnp.broadcast_to(
                jnp.arange(t, dtype=jnp.int32), (b, t))
            carry = (x, sizes, gather_map)
            for block in self.blocks:
                x, sizes, gather_map = block(carry, deterministic)
                carry = (self._constrain(x), sizes, gather_map)
            return unmerge(self.head(carry[0]), gather_map)
        for block in self.blocks:
            x = self._constrain(block(x, deterministic))
        return self.head(x)


# timm tag -> architecture hyperparameters (vit_builder.py instantiates these
# via timm.create_model; we declare them directly). Tags not listed here are
# pattern-parsed by _parse_timm_vit_tag, giving the reference's "any timm ViT
# tag" behavior (timm_builder.py:7-20) for the standard family.
VIT_CONFIGS = {
    # tiny config for fast unit tests
    "vit_test": dict(patch_size=8, embed_dim=32, depth=2, num_heads=2),
}

# timm size-name -> (embed_dim, depth, num_heads); mlp_ratio is 4.0 for all
# standard ViTs (timm vision_transformer.py model registry)
_VIT_SIZES = {
    "tiny": (192, 12, 3),
    "small": (384, 12, 6),
    "medium": (512, 12, 8),
    "base": (768, 12, 12),
    "large": (1024, 24, 16),
    "huge": (1280, 32, 16),
}

_TAG_RE = re.compile(
    r"^vit_(?P<size>tiny|small|medium|base|large|huge)"
    r"_patch(?P<patch>\d+)"
    r"_(?P<res>\d+)"
    r"(?P<rest>(_.*)?)$"
)


def _parse_timm_vit_tag(tag: str) -> Optional[dict]:
    """Standard timm ViT tag -> architecture dict. The trailing resolution
    (224/384/...) is the *pretraining* resolution — runtime resolution is the
    img_size argument (checkpoints are PE-interpolated across grids) — and
    suffixes like ``_in21k`` / ``.augreg_...`` select weights, not
    architecture, so both are accepted and ignored here."""
    m = _TAG_RE.match(tag.split(".")[0])
    if not m:
        return None
    dim, depth, heads = _VIT_SIZES[m.group("size")]
    return dict(patch_size=int(m.group("patch")), embed_dim=dim,
                depth=depth, num_heads=heads)


def resolve_vit_config(tag: str, arch: Optional[dict] = None) -> dict:
    """Tag table -> timm-pattern parse -> YAML ``model.image_encoder.arch``
    overrides. A fully-specified arch dict works with any tag name."""
    spec = VIT_CONFIGS.get(tag)
    if spec is None:
        spec = _parse_timm_vit_tag(tag)
    spec = dict(spec) if spec else {}
    if arch:
        spec.update({k: v for k, v in dict(arch).items() if v is not None})
    required = ("patch_size", "embed_dim", "depth", "num_heads")
    missing = [k for k in required if k not in spec]
    if missing:
        raise KeyError(
            f"Unknown ViT tag '{tag}' (not in the table, not a standard timm "
            f"pattern) and model.image_encoder.arch is missing {missing}"
        )
    return spec


def build_vit(tag: str, img_size: int, dtype: jnp.dtype = jnp.float32,
              dropout: float = 0.0, remat: bool = False,
              arch: Optional[dict] = None,
              remat_policy: str = "none",
              act_sharding=None,
              expert_sharding=None) -> VisionTransformer:
    spec = resolve_vit_config(tag, arch)
    return VisionTransformer(img_size=img_size, dtype=dtype, dropout=dropout,
                             remat=remat, remat_policy=remat_policy,
                             act_sharding=act_sharding,
                             expert_sharding=expert_sharding, **spec)
