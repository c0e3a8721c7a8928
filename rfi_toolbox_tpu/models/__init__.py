"""Flax segmentation models."""

from .folding import fold_batchnorm
from .instance import (
    SOLOLite,
    assign_targets,
    matrix_nms,
    solo_decode,
    solo_loss,
)
from .unet import (
    Decoder,
    DoubleConv,
    Encoder,
    UNet,
    UNetBigger,
    UNetDifferentActivation,
    UNetOverfit,
    create_model,
    depth_to_space,
    space_to_depth,
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
    "space_to_depth",
    "depth_to_space",
    "fold_batchnorm",
    "SOLOLite",
    "solo_loss",
    "solo_decode",
    "assign_targets",
    "matrix_nms",
]
