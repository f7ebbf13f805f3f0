"""Two-tower CLIP pipeline: ViT image tower + BERT text tower + projections
+ LoDA pooling + learnable temperature.

Parity: reference ``simseg/models/pipelines/clip.py:13-229`` (CLIPModel):
- forward_image_feature (:65-84): full token sequence; identity pool -> CLS
  token only, otherwise patch tokens ``[:, 1:]``
- forward_image_project (:87-93): projection -> pool -> L2 norm when the
  projection is 'simple'
- forward_text_feature (:96-108): tokens from ``target_token_idx`` on
- forward_text_project (:111-120): projection -> masked pool -> L2 norm
- temperature clamp [0.001, 0.5] lives with the loss in the reference
  (mml_loss.py:56); here the (optionally learnable) temperature is a model
  parameter surfaced by ``__call__`` so pure loss fns and BSGS can use it.

The module is pure: ``__call__(batch, embeddings=...)`` returns embeddings
(+ temperature); losses are pure functions in ``simseg_tpu.ops.losses``
applied by the train step.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from simseg_tpu.models.bert import build_bert
from simseg_tpu.models.projection import ComplexProjection, SimpleProjection
from simseg_tpu.models.vit import build_vit
from simseg_tpu.ops.pooling import avg_pool, l2_normalize, topk_pool
from simseg_tpu.utils.registry import Registry

PIPELINE = Registry("PIPELINE")


class CLIPModel(nn.Module):
    # image tower
    image_tag: str = "vit_base_patch16_224_in21k"
    img_size: int = 224
    # YAML-declared architecture overrides for tags outside the built-in
    # tables (tuple of (key, value) pairs — hashable for module comparison)
    image_arch: Optional[Tuple[Tuple[str, Any], ...]] = None
    # text tower
    text_tag: str = "bert-base-uncased"
    text_arch: Optional[Tuple[Tuple[str, Any], ...]] = None
    target_token_idx: int = 0
    # projection
    projection_name: str = "simple"  # simple | complex
    projection_dim: int = 512
    projection_dropout: float = 0.1
    # pooling
    pool_name: str = "loda"  # loda | avg | identity
    image_k: int = 5
    text_k: int = 1
    # temperature
    temperature_name: str = "parameter"  # parameter | constant
    temperature_init: float = 0.02
    # numerics
    dtype: jnp.dtype = jnp.float32
    dropout: float = 0.0
    remat: bool = False
    remat_policy: str = "none"
    # sequence-parallel residual-stream sharding for the image tower
    # (NamedSharding over (B, T, D); see models/vit.py act_sharding)
    act_sharding: Optional[Any] = None
    # expert-parallel sharding for MoE expert buffers (ops/moe.py; the
    # expert count itself rides image_arch's moe_experts)
    expert_sharding: Optional[Any] = None

    def setup(self) -> None:
        # tag dispatch mirrors the reference's ImageEncoder kwargs logic
        # ('vit' in tag -> ViT with img_size; else CNN with global_pool='',
        # pipelines/clip.py:191-194)
        if "vit" in self.image_tag:
            self.image_encoder = build_vit(self.image_tag, self.img_size,
                                           self.dtype, self.dropout,
                                           remat=self.remat,
                                           arch=dict(self.image_arch or ()),
                                           remat_policy=self.remat_policy,
                                           act_sharding=self.act_sharding,
                                           expert_sharding=self.expert_sharding)
        else:
            from simseg_tpu.models.cnn import build_cnn

            self.image_encoder = build_cnn(self.image_tag, self.dtype,
                                           arch=dict(self.image_arch or ()))
        self.text_encoder = build_bert(self.text_tag, self.dtype, self.dropout,
                                       remat=self.remat,
                                       arch=dict(self.text_arch or ()),
                                       remat_policy=self.remat_policy,
                                       expert_sharding=self.expert_sharding)
        proj = {
            "simple": lambda name: SimpleProjection(self.projection_dim, self.dtype,
                                                    name=name),
            "complex": lambda name: ComplexProjection(self.projection_dim,
                                                      self.projection_dropout,
                                                      self.dtype, name=name),
        }
        if self.projection_name not in proj:
            raise NotImplementedError(f"projection '{self.projection_name}'")
        self.image_projection = proj[self.projection_name]("image_projection")
        self.text_projection = proj[self.projection_name]("text_projection")

        if self.temperature_name == "parameter":
            self.temperature_param = self.param(
                "temperature", lambda _key: jnp.asarray(self.temperature_init, jnp.float32)
            )
        elif self.temperature_name != "constant":
            raise NotImplementedError(f"temperature '{self.temperature_name}'")

    # -- temperature -----------------------------------------------------------
    def temperature(self) -> jnp.ndarray:
        """Clamped temperature (parity: mml_loss.py:56)."""
        if self.temperature_name == "parameter":
            t = self.temperature_param
        else:
            t = jnp.asarray(self.temperature_init, jnp.float32)
        return jnp.clip(t, 0.001, 0.5)

    # -- image tower -------------------------------------------------------------
    def forward_image_feature(self, images: jnp.ndarray,
                              deterministic: bool = True,
                              train_bn: bool = False) -> jnp.ndarray:
        """(B, H, W, 3) -> token features. ViT + identity pool: CLS (B, D);
        ViT otherwise: patch tokens (B, N, D); CNN: spatial map reshaped to
        (B, HW, C) (parity: pipelines/clip.py:65-84). train_bn: CNN
        BatchNorm uses (and mutates) batch statistics — the reference's
        freeze_cnn_bn=False training mode (pipelines/clip.py:51-62)."""
        if "vit" in self.image_tag:
            tokens = self.image_encoder(images, deterministic)
        else:
            tokens = self.image_encoder(images, deterministic, train_bn)
        if tokens.ndim == 4:  # CNN feature map (B, h, w, C)
            b, h, w, c = tokens.shape
            return tokens.reshape(b, h * w, c)
        if self.pool_name == "identity":
            return tokens[:, 0]
        return tokens[:, 1:]

    def forward_image_tokens(self, images: jnp.ndarray,
                             deterministic: bool = True) -> jnp.ndarray:
        """ViT: full (B, 1+N, D) sequence (seg eval needs CLS + patches);
        CNN: (B, HW, C) spatial tokens."""
        tokens = self.image_encoder(images, deterministic)
        if tokens.ndim == 4:
            b, h, w, c = tokens.shape
            return tokens.reshape(b, h * w, c)
        return tokens

    def forward_image_project(self, image_features: jnp.ndarray,
                              deterministic: bool = True) -> jnp.ndarray:
        x = self.image_projection(image_features, deterministic)
        if self.pool_name == "loda":
            x = topk_pool(x, self.image_k)
        elif self.pool_name == "avg":
            x = avg_pool(x)
        if self.projection_name == "simple":
            x = l2_normalize(x)
        return x

    def project_image_tokens(self, image_features: jnp.ndarray,
                             deterministic: bool = True) -> jnp.ndarray:
        """Per-token projection without pooling (dense seg maps,
        parity: seg_evaluation.py:102)."""
        return self.image_projection(image_features, deterministic)

    # -- text tower ---------------------------------------------------------------
    def forward_text_feature(self, input_ids: jnp.ndarray,
                             attention_mask: jnp.ndarray,
                             deterministic: bool = True) -> jnp.ndarray:
        hidden = self.text_encoder(input_ids, attention_mask,
                                   deterministic=deterministic)
        if self.pool_name == "identity":
            return hidden[:, self.target_token_idx]
        return hidden[:, self.target_token_idx:]

    def forward_text_project(self, text_features: jnp.ndarray,
                             attention_mask: Optional[jnp.ndarray],
                             deterministic: bool = True) -> jnp.ndarray:
        x = self.text_projection(text_features, deterministic)
        if self.pool_name == "loda":
            mask = None
            if attention_mask is not None:
                mask = attention_mask[:, self.target_token_idx:]
            x = topk_pool(x, self.text_k, mask)
        elif self.pool_name == "avg":
            mask = None
            if attention_mask is not None:
                mask = attention_mask[:, self.target_token_idx:]
            x = avg_pool(x, mask)
        if self.projection_name == "simple":
            x = l2_normalize(x)
        return x

    # -- joint ----------------------------------------------------------------------
    def __call__(
        self,
        batch: Dict[str, jnp.ndarray],
        embeddings: Any = "all",
        deterministic: bool = True,
        train_bn: bool = False,
    ) -> Tuple[jnp.ndarray, ...]:
        """parity: pipelines/clip.py:152-176 forward. Returns
        (image_emb, text_emb, temperature) for embeddings='all'; single-tower
        raw features for embeddings='image'/'text'."""
        if embeddings == "image":
            return self.forward_image_feature(batch["image"], deterministic)
        if embeddings == "text":
            return self.forward_text_feature(
                batch["input_ids"], batch["attention_mask"], deterministic
            )
        img = self.forward_image_feature(batch["image"], deterministic, train_bn)
        txt = self.forward_text_feature(
            batch["input_ids"], batch["attention_mask"], deterministic
        )
        img = self.forward_image_project(img, deterministic)
        txt = self.forward_text_project(txt, batch["attention_mask"], deterministic)
        return img, txt, self.temperature()


def build_clip_model(cfg, dtype: Optional[jnp.dtype] = None,
                     mesh=None) -> CLIPModel:
    """Construct the CLIP pipeline from a config tree
    (parity: pipelines/clip.py:226-229 registered factory).

    mesh: when given and cfg.dist.sp is true on a tensor-parallel mesh, the
    image tower's residual stream is sequence-sharded over 'model'
    (Megatron-SP via one GSPMD annotation, models/vit.py act_sharding);
    when cfg.dist.moe_ep is true the MoE expert buffers are sharded over
    'data' (expert parallelism, ops/moe.py)."""
    if dtype is None:
        dtype = jnp.bfloat16 if cfg.dist.get("bf16", False) else jnp.float32
    act_sharding = None
    expert_sharding = None
    if mesh is not None and cfg.dist.get("sp", False):
        from jax.sharding import NamedSharding, PartitionSpec as P

        from simseg_tpu.parallel.mesh import MODEL_AXIS

        if MODEL_AXIS not in mesh.axis_names:
            raise ValueError("dist.sp requires dist.tp_size > 1 (the token "
                             "dim shards over the tensor-parallel axis)")
        # batch dim stays unconstrained: it propagates from the input
        # sharding, and pinning it would break batch-1 init
        act_sharding = NamedSharding(mesh, P(None, MODEL_AXIS, None))
    if mesh is not None and cfg.dist.get("moe_ep", False):
        from jax.sharding import NamedSharding, PartitionSpec as P

        from simseg_tpu.parallel.mesh import DATA_AXIS

        # (B, E, C, D) buffers: expert dim over 'data' (ops/moe.py)
        expert_sharding = NamedSharding(mesh, P(None, DATA_AXIS, None, None))
    m = cfg.model

    def arch_tuple(enc_cfg):
        arch = enc_cfg.get("arch", {}) or {}
        # YAML/CLI list values (e.g. tome_schedule) -> tuples so the flax
        # module stays hashable
        items = tuple(sorted(
            (k, tuple(v) if isinstance(v, list) else v)
            for k, v in dict(arch).items() if v is not None))
        return items or None

    return CLIPModel(
        image_tag=m.image_encoder.tag,
        img_size=cfg.transforms.input_size,
        image_arch=arch_tuple(m.image_encoder),
        text_tag=m.text_encoder.tag,
        text_arch=arch_tuple(m.text_encoder),
        target_token_idx=m.text_encoder.target_token_idx,
        projection_name=m.projection.name,
        projection_dim=m.projection.dim,
        projection_dropout=m.projection.get("complex_projection", {}).get("drop_out", 0.1),
        pool_name=m.pool.name,
        image_k=m.pool.loda.image_k,
        text_k=m.pool.loda.text_k,
        temperature_name=cfg.loss.temperature.name,
        temperature_init=cfg.loss.temperature.value,
        dtype=dtype,
        remat=m.get("remat", False),
        remat_policy=m.get("remat_policy", "none"),
        act_sharding=act_sharding,
        expert_sharding=expert_sharding,
    )


@PIPELINE.register(name="clip")
def _clip_pipeline(cfg, **kwargs):
    return build_clip_model(cfg, **kwargs)
