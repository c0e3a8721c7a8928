"""Segmentation losses.

Same loss as the reference training stack: BCE-with-logits + soft Dice
with smooth=1 (scripts/train_model.py:120-128, 146), as pure jittable
functions over logits/targets of any matching shape.
"""

import jax
import jax.numpy as jnp

__all__ = ["bce_with_logits_loss", "dice_loss", "bce_dice_loss"]


def bce_with_logits_loss(logits, targets):
    """Mean binary cross-entropy on logits (numerically stable form)."""
    logits = logits.astype(jnp.float32)
    targets = targets.astype(jnp.float32)
    # max(x,0) - x*y + log(1 + exp(-|x|))
    loss = jnp.maximum(logits, 0) - logits * targets + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )
    return jnp.mean(loss)


def dice_loss(logits, targets, smooth=1.0):
    """1 - (2*intersection + smooth) / (|p| + |t| + smooth) over the
    flattened batch (train_model.py:122-128)."""
    probs = jax.nn.sigmoid(logits.astype(jnp.float32)).ravel()
    targets = targets.astype(jnp.float32).ravel()
    intersection = jnp.sum(probs * targets)
    return 1.0 - (2.0 * intersection + smooth) / (
        jnp.sum(probs) + jnp.sum(targets) + smooth
    )


def bce_dice_loss(logits, targets, smooth=1.0):
    """The reference's training loss: BCEWithLogits + dice (smooth=1)."""
    return bce_with_logits_loss(logits, targets) + dice_loss(logits, targets, smooth)
