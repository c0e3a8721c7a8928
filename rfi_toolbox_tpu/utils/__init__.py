"""Utilities: errors, profiling, and small helpers."""

from .errors import ConfigValidationError, DataShapeError, RFIToolboxError

__all__ = ["RFIToolboxError", "ConfigValidationError", "DataShapeError"]
