"""BERT text encoder (bert-base-uncased layout) returning last hidden state.

Parity: reference ``simseg/models/backbones/mml/huggingface_builder.py:6-23``
(HF AutoModel with ``add_pooling_layer=False``; only ``last_hidden_state`` is
consumed, ``pipelines/clip.py:220-223``). The architecture matches HF
``BertModel``: word/position/token-type embeddings + LayerNorm(eps 1e-12),
post-LN encoder blocks with separate q/k/v projections, exact GELU
intermediate, additive padding mask.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from simseg_tpu.ops.attention import multi_head_attention, padding_bias


class BertLayer(nn.Module):
    num_heads: int
    intermediate_dim: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    # mixture-of-experts FFN (beyond reference, ops/moe.py); same semantics
    # as models/vit.py ViTBlock
    moe_experts: int = 0
    moe_capacity: float = 1.25
    expert_sharding: Optional[object] = None
    # int8 PTQ inference (ops/quant.py; same semantics as models/vit.py):
    # q/k/v/attention_output/intermediate/output run int8 x int8 -> int32.
    # Per-token activation scales never cross tokens, so padded positions
    # cannot perturb real ones. Inference only (runner guard).
    quant: str = "none"

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        attention_bias: Optional[jnp.ndarray],
        deterministic: bool = True,
        token_mask: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        from simseg_tpu.ops.quant import dense_cls

        dense = dense_cls(self.quant)
        d = x.shape[-1]
        q = dense(d, dtype=self.dtype, name="query")(x)
        k = dense(d, dtype=self.dtype, name="key")(x)
        v = dense(d, dtype=self.dtype, name="value")(x)
        attn = multi_head_attention(q, k, v, self.num_heads, attention_bias, self.dtype)
        attn = dense(d, dtype=self.dtype, name="attention_output")(attn)
        attn = nn.Dropout(self.dropout)(attn, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=1e-12, dtype=self.dtype, name="attention_norm")(x + attn)

        if self.moe_experts > 0:
            from simseg_tpu.ops.moe import MoEMlp

            out = MoEMlp(self.moe_experts, self.intermediate_dim, d,
                         self.moe_capacity, self.dtype,
                         self.expert_sharding, name="moe")(
                x, deterministic, token_mask)
        else:
            inter = dense(self.intermediate_dim, dtype=self.dtype, name="intermediate")(x)
            # exact erf-GELU matches torch bit-for-bit in f32 (parity tests);
            # in bf16 the tanh approximation's ~1e-3 error sits below bf16
            # rounding and the erf is a measured VPU bottleneck (+33% ViT fwd)
            inter = nn.gelu(inter, approximate=self.dtype != jnp.float32)
            out = dense(d, dtype=self.dtype, name="output")(inter)
        out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        return nn.LayerNorm(epsilon=1e-12, dtype=self.dtype, name="output_norm")(x + out)


class BertEncoder(nn.Module):
    vocab_size: int = 30522
    hidden_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    intermediate_dim: int = 3072
    max_position: int = 512
    type_vocab_size: int = 2
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    remat: bool = False
    remat_policy: str = "none"  # none | dots (see models/vit.py)
    # MoE FFN in every moe_every-th layer (ops/moe.py; arch knobs)
    moe_experts: int = 0
    moe_every: int = 2
    moe_capacity: float = 1.25
    expert_sharding: Optional[object] = None
    # int8 PTQ inference, opt-in via model.text_encoder.arch=
    # "{'quant': 'int8'}" (ops/quant.py; param tree unchanged)
    quant: str = "none"

    def setup(self) -> None:
        # setup-style (rather than @nn.compact) so ``embed`` is callable as
        # a standalone stage — the pipeline-parallel executor (parallel/pp.py)
        # runs embed -> pipelined layers. Param names are identical to the
        # former compact layout (checkpoint bridge compatibility).
        self.word_embeddings = nn.Embed(
            self.vocab_size, self.hidden_dim, dtype=self.dtype,
            name="word_embeddings")
        self.position_embeddings = nn.Embed(
            self.max_position, self.hidden_dim, dtype=self.dtype,
            name="position_embeddings")
        self.token_type_embeddings = nn.Embed(
            self.type_vocab_size, self.hidden_dim, dtype=self.dtype,
            name="token_type_embeddings")
        self.embeddings_norm = nn.LayerNorm(
            epsilon=1e-12, dtype=self.dtype, name="embeddings_norm")
        self.embed_drop = nn.Dropout(self.dropout)

        layer_cls = BertLayer
        if self.remat:
            from simseg_tpu.models.vit import _remat_policy

            layer_cls = nn.remat(BertLayer, static_argnums=(3,),
                                 policy=_remat_policy(self.remat_policy))

        def is_moe(i: int) -> bool:
            return (self.moe_experts > 0
                    and i % self.moe_every == self.moe_every - 1)

        self.layers = [
            layer_cls(
                self.num_heads, self.intermediate_dim, self.dropout, self.dtype,
                moe_experts=self.moe_experts if is_moe(i) else 0,
                moe_capacity=self.moe_capacity,
                expert_sharding=self.expert_sharding,
                quant=self.quant,
                name=f"layer_{i}",
            )
            for i in range(self.depth)
        ]

    def embed(self, input_ids: jnp.ndarray,
              token_type_ids: Optional[jnp.ndarray] = None,
              deterministic: bool = True) -> jnp.ndarray:
        """Word + position + token-type embeddings, LayerNorm, dropout:
        (B, T) int32 -> (B, T, D)."""
        t = input_ids.shape[1]
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)
        position_ids = jnp.arange(t, dtype=jnp.int32)[None, :]
        x = (self.word_embeddings(input_ids)
             + self.position_embeddings(position_ids)
             + self.token_type_embeddings(token_type_ids))
        x = self.embeddings_norm(x)
        return self.embed_drop(x, deterministic=deterministic)

    def __call__(
        self,
        input_ids: jnp.ndarray,
        attention_mask: Optional[jnp.ndarray] = None,
        token_type_ids: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        """input_ids: (B, T) int32. Returns last_hidden_state (B, T, D)."""
        x = self.embed(input_ids, token_type_ids, deterministic)

        bias = None
        if attention_mask is not None:
            bias = padding_bias(attention_mask, jnp.float32)

        for i, layer in enumerate(self.layers):
            is_moe = (self.moe_experts > 0
                      and i % self.moe_every == self.moe_every - 1)
            x = layer(x, bias, deterministic,
                      attention_mask if is_moe else None)
        return x


BERT_CONFIGS = {
    # tiny config for fast unit tests
    "bert_test": dict(
        vocab_size=128, hidden_dim=32, depth=2, num_heads=2,
        intermediate_dim=64, max_position=64, type_vocab_size=2,
    ),
    # standard HF BERT family (huggingface_builder.py:6-23 loads any
    # AutoModel; these cover the published-config architectures offline,
    # _hf_config_arch extends to any cached tag, and
    # model.text_encoder.arch declares arbitrary ones from YAML)
    "bert-base-uncased": dict(
        vocab_size=30522, hidden_dim=768, depth=12, num_heads=12,
        intermediate_dim=3072, max_position=512, type_vocab_size=2,
    ),
    "bert-base-cased": dict(
        vocab_size=28996, hidden_dim=768, depth=12, num_heads=12,
        intermediate_dim=3072, max_position=512, type_vocab_size=2,
    ),
    "bert-large-uncased": dict(
        vocab_size=30522, hidden_dim=1024, depth=24, num_heads=16,
        intermediate_dim=4096, max_position=512, type_vocab_size=2,
    ),
    "bert-large-cased": dict(
        vocab_size=28996, hidden_dim=1024, depth=24, num_heads=16,
        intermediate_dim=4096, max_position=512, type_vocab_size=2,
    ),
    "bert-base-multilingual-cased": dict(
        vocab_size=119547, hidden_dim=768, depth=12, num_heads=12,
        intermediate_dim=3072, max_position=512, type_vocab_size=2,
    ),
}


def _hf_config_arch(tag: str) -> Optional[dict]:
    """Resolve a BERT-family architecture from a locally-cached HuggingFace
    config (AutoConfig; no network — this environment has zero egress).
    Returns None when transformers or the cached config is unavailable or
    the architecture is not BERT-shaped."""
    try:
        from transformers import AutoConfig

        hf = AutoConfig.from_pretrained(tag, local_files_only=True)
    except Exception:
        return None
    if getattr(hf, "model_type", "") != "bert":
        return None
    return dict(
        vocab_size=hf.vocab_size,
        hidden_dim=hf.hidden_size,
        depth=hf.num_hidden_layers,
        num_heads=hf.num_attention_heads,
        intermediate_dim=hf.intermediate_size,
        max_position=hf.max_position_embeddings,
        type_vocab_size=hf.type_vocab_size,
    )


def resolve_bert_config(tag: str, arch: Optional[dict] = None) -> dict:
    """Tag table -> cached HF AutoConfig -> YAML ``model.text_encoder.arch``
    overrides."""
    spec = BERT_CONFIGS.get(tag)
    if spec is None:
        spec = _hf_config_arch(tag)
    spec = dict(spec) if spec else {}
    if arch:
        spec.update({k: v for k, v in dict(arch).items() if v is not None})
    required = ("vocab_size", "hidden_dim", "depth", "num_heads",
                "intermediate_dim")
    missing = [k for k in required if k not in spec]
    if missing:
        raise KeyError(
            f"Unknown BERT tag '{tag}' (not in the table, no cached HF "
            f"config) and model.text_encoder.arch is missing {missing}"
        )
    spec.setdefault("max_position", 512)
    spec.setdefault("type_vocab_size", 2)
    return spec


def build_bert(tag: str, dtype: jnp.dtype = jnp.float32, dropout: float = 0.0,
               remat: bool = False, arch: Optional[dict] = None,
               remat_policy: str = "none",
               expert_sharding=None) -> BertEncoder:
    spec = resolve_bert_config(tag, arch)
    return BertEncoder(dtype=dtype, dropout=dropout, remat=remat,
                       remat_policy=remat_policy,
                       expert_sharding=expert_sharding, **spec)
