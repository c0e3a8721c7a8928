"""Training: losses, train state, trainer, checkpointing."""

from .coherent_trainer import CoherentTrainer, coherent_batch
from .instance_trainer import (
    InstanceTrainer,
    make_instance_fused_steps,
    make_instance_train_step,
)
from .losses import bce_dice_loss, bce_with_logits_loss, dice_loss
from .raw_patches import RawPatchTrainer, augment_batch, make_raw_patch_step
from .trainer import (
    Trainer,
    TrainState,
    create_train_state,
    eval_step,
    export_params,
    load_params,
    train_step,
    train_steps,
)

__all__ = [
    "Trainer",
    "TrainState",
    "create_train_state",
    "train_step",
    "train_steps",
    "eval_step",
    "bce_dice_loss",
    "bce_with_logits_loss",
    "dice_loss",
    "RawPatchTrainer",
    "augment_batch",
    "make_raw_patch_step",
    "CoherentTrainer",
    "coherent_batch",
    "InstanceTrainer",
    "make_instance_train_step",
    "make_instance_fused_steps",
    "export_params",
    "load_params",
]
