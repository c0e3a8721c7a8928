"""Preprocessing: waterfall -> ML-ready patch datasets.

Exports the same surface as the reference
(rfi_toolbox/preprocessing/__init__.py:7): ``Preprocessor``,
``GPUPreprocessor`` (alias of :class:`DevicePreprocessor`), plus the
pure functional pipeline for direct device-side use.
"""

from . import pipeline
from .preprocessor import DevicePreprocessor, GPUPreprocessor, Preprocessor, patchify

__all__ = [
    "Preprocessor",
    "DevicePreprocessor",
    "GPUPreprocessor",
    "patchify",
    "pipeline",
]
