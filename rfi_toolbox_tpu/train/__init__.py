"""Training: losses, train state, trainer, checkpointing."""

from .losses import bce_dice_loss, bce_with_logits_loss, dice_loss
from .trainer import Trainer, TrainState, create_train_state, eval_step, train_step

__all__ = [
    "Trainer",
    "TrainState",
    "create_train_state",
    "train_step",
    "eval_step",
    "bce_dice_loss",
    "bce_with_logits_loss",
    "dice_loss",
]
