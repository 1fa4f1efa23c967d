from vqatpu.train.checkpoints import (
    load_checkpoint,
    load_params,
    restore_train_state,
    save_checkpoint,
    save_params,
)
from vqatpu.train.logging import AverageMeter, Logger, StopwatchMeter, TimeMeter
from vqatpu.train.optim import adamax, adamax_with_lr, clip_flat_grads, lr_for_epoch
from vqatpu.train.steps import (
    TrainState,
    compute_score_with_logits,
    make_eval_step,
    make_train_state,
    make_train_step,
    trainable_mask,
)

__all__ = [
    "AverageMeter", "Logger", "StopwatchMeter", "TimeMeter", "TrainState",
    "adamax", "adamax_with_lr", "clip_flat_grads", "compute_score_with_logits",
    "load_checkpoint", "load_params", "lr_for_epoch", "make_eval_step",
    "make_train_state", "make_train_step", "restore_train_state",
    "save_checkpoint", "save_params", "trainable_mask",
]
