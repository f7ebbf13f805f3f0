"""simseg_tpu — a TPU-native JAX/XLA/Pallas framework for text-supervised
zero-shot semantic segmentation and image-text retrieval.

Rebuilds the capabilities of the SimSeg reference (CVPR'23, PyTorch) as an
idiomatic TPU stack:

- two-tower CLIP model (ViT image encoder + BERT text encoder) in flax,
  bf16-friendly, returning full token sequences for dense inference
- locality-driven-alignment (LoDA) top-k pooled InfoNCE contrastive loss with
  negatives shared across a ``jax.sharding.Mesh`` data axis (XLA collectives
  over ICI instead of NCCL all-gather)
- fully on-device zero-shot segmentation decode: patch-text similarity maps,
  upsampling, mean-field dense-CRF refinement, morphology and mIoU
  accumulation, fused under one ``jax.jit``
- exact big-batch contrastive gradients from micro-batches (the reference's
  "BSGS" decoupled gradient accumulation) via a two-pass ``lax.scan``
- YAML + dotted-CLI config system, hook-based training runner, torch ``.pth``
  checkpoint bridge, Orbax native checkpoints.

Reference parity map lives in SURVEY.md at the repo root; individual modules
cite the reference file/lines they provide parity with.
"""

__version__ = "0.3.0"

# Lazy public API: heavy submodules (jax tracing, flax) load on first use.
_PUBLIC = {
    "cfg": ("simseg_tpu.config", "cfg"),
    "update_cfg": ("simseg_tpu.config", "update_cfg"),
    "AttrDict": ("simseg_tpu.utils.collections", "AttrDict"),
    "logger": ("simseg_tpu.utils.logger", "logger"),
    "ENV": ("simseg_tpu.utils.context", "ENV"),
    "CLIPModel": ("simseg_tpu.models.clip", "CLIPModel"),
    "build_clip_model": ("simseg_tpu.models.clip", "build_clip_model"),
    "PIPELINE": ("simseg_tpu.models.clip", "PIPELINE"),
    "DATALOADER": ("simseg_tpu.data.datasets", "DATALOADER"),
    "TrainState": ("simseg_tpu.engine.train_step", "TrainState"),
    "make_train_step": ("simseg_tpu.engine.train_step", "make_train_step"),
    "CLIPRunner": ("simseg_tpu.core.runner", "CLIPRunner"),
    "LinearProbRunner": ("simseg_tpu.core.runner", "LinearProbRunner"),
    "make_mesh": ("simseg_tpu.parallel.mesh", "make_mesh"),
    "load_clip_checkpoint": ("simseg_tpu.checkpoint.torch_bridge",
                             "load_clip_checkpoint"),
}


def __getattr__(name):
    if name in _PUBLIC:
        import importlib

        module, attr = _PUBLIC[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(f"module 'simseg_tpu' has no attribute '{name}'")


def __dir__():
    return sorted(list(globals()) + list(_PUBLIC))
