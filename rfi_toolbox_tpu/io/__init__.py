"""Measurement Set I/O (host-staged).

``MSLoader`` works against casatools (optional) or an in-memory
:class:`FakeMS`. Mirrors the reference's degradation behavior
(io/__init__.py:10-27): importing this package never requires CASA.
"""

from .fake_ms import FakeMS, FakeTable, make_fake_ms
from .flagging import (flag_measurement_set, flag_waterfalls,
                       flag_waterfalls_coherent)
from .ms_injection import inject_synthetic_data
from .ms_loader import MSLoader

try:  # pragma: no cover - depends on environment
    import casatools  # noqa: F401

    CASA_AVAILABLE = True
except ImportError:
    CASA_AVAILABLE = False

__all__ = [
    "MSLoader",
    "inject_synthetic_data",
    "flag_measurement_set",
    "flag_waterfalls",
    "flag_waterfalls_coherent",
    "FakeMS",
    "FakeTable",
    "make_fake_ms",
    "CASA_AVAILABLE",
]
