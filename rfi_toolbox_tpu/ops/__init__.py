"""Pallas TPU kernels for the hot preprocessing ops.

Each kernel has a jnp reference implementation in
:mod:`rfi_toolbox_tpu.preprocess.pipeline` used for parity testing and
as the CPU/interpret fallback.
"""

from .conv3x3 import (
    conv3x3,
    conv3x3_bias_relu,
    conv3x3_bias_relu_or_xla,
    conv3x3_fits_vmem,
)
from .fused_channels import (
    fused_extract_channel_planes,
    fused_extract_channels,
    fused_gather_extract,
    fused_plane_gather_transform,
)
from .mad_flags import mad_flag_patches_pallas

__all__ = [
    "fused_extract_channels",
    "fused_extract_channel_planes",
    "fused_gather_extract",
    "fused_plane_gather_transform",
    "mad_flag_patches_pallas",
    "conv3x3",
    "conv3x3_bias_relu",
    "conv3x3_bias_relu_or_xla",
    "conv3x3_fits_vmem",
]
