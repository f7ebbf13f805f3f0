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

__version__ = "0.1.0"
