from simseg_tpu.core.lr_schedule import LR, build_schedule
from simseg_tpu.core.optim import build_optimizer

__all__ = ["LR", "build_schedule", "build_optimizer"]
