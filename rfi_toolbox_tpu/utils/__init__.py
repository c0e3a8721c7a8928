"""Utilities: errors, profiling, and small helpers."""

from .errors import ConfigValidationError, DataShapeError, RFIToolboxError
from .platform import configure_platform, enable_compilation_cache
from .profiling import StepTimer, annotate, trace
from .progress import progress
from .transfer import to_device, to_host

__all__ = [
    "progress",
    "RFIToolboxError",
    "ConfigValidationError",
    "DataShapeError",
    "configure_platform",
    "enable_compilation_cache",
    "StepTimer",
    "annotate",
    "trace",
    "to_device",
    "to_host",
]
