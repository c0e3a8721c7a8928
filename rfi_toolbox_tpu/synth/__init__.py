"""Synthetic RFI generation.

- :class:`SyntheticDataGenerator`: config-driven generator with exact
  ground-truth masks (reference rfi_toolbox/data_generation/).
- :class:`RFISimulator`: coherent-phase time-frequency simulator
  (reference rfi_toolbox/core/simulator.py).
- :mod:`events` / :mod:`sample`: jittable building blocks.
"""

from .events import EVENT_TYPES
from .generator import RawPatchDataset, SyntheticDataGenerator
from .sample import generate_bandpass, make_sample_generator, params_to_event_list
from .simulator import RFISimulator

__all__ = [
    "SyntheticDataGenerator",
    "RawPatchDataset",
    "RFISimulator",
    "make_sample_generator",
    "generate_bandpass",
    "params_to_event_list",
    "EVENT_TYPES",
]
