from simseg_tpu.engine.bsgs import make_bsgs_grad_fn, make_bsgs_train_step
from simseg_tpu.engine.train_step import (
    TrainState,
    clip_loss_fn,
    make_eval_step,
    make_train_step,
    opt_state_sharding,
)

__all__ = [
    "TrainState",
    "clip_loss_fn",
    "make_eval_step",
    "make_train_step",
    "make_bsgs_grad_fn",
    "make_bsgs_train_step",
    "opt_state_sharding",
]
