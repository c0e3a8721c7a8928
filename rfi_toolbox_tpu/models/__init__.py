"""Flax segmentation models."""

from .unet import (
    Decoder,
    DoubleConv,
    Encoder,
    UNet,
    UNetBigger,
    UNetDifferentActivation,
    UNetOverfit,
    create_model,
)

__all__ = [
    "UNet",
    "UNetBigger",
    "UNetOverfit",
    "UNetDifferentActivation",
    "DoubleConv",
    "Encoder",
    "Decoder",
    "create_model",
]
