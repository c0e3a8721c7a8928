"""Custom exceptions for rfi_toolbox_tpu.

Parity: /root/reference/rfi_toolbox/utils/errors.py:6-28 (same hierarchy).
"""


class RFIToolboxError(Exception):
    """Base exception for rfi_toolbox_tpu."""


class ConfigValidationError(RFIToolboxError):
    """Raised when configuration validation fails.

    Caught early, before expensive operations like training or data
    generation (and before XLA compilation of a mis-shaped pipeline).
    """


class DataShapeError(RFIToolboxError):
    """Raised when data has an unexpected shape.

    Example: loading MS data with incompatible dimensions, or a
    preprocessing pipeline that would produce wrong-sized patches.
    """
