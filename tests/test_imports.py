"""Import smoke tests (the reference's largest test class,
tests/test_imports.py) including the reference-path compatibility
aliases and fresh-import isolation for the lazy __getattr__."""

import importlib
import sys

import pytest

CORE_MODULES = [
    "rfi_toolbox_tpu.evaluation",
    "rfi_toolbox_tpu.preprocess",
    "rfi_toolbox_tpu.synth",
    "rfi_toolbox_tpu.models",
    "rfi_toolbox_tpu.train",
    "rfi_toolbox_tpu.data",
    "rfi_toolbox_tpu.parallel",
    "rfi_toolbox_tpu.config",
    "rfi_toolbox_tpu.io",
    "rfi_toolbox_tpu.ops",
    "rfi_toolbox_tpu.utils",
    "rfi_toolbox_tpu.native",
    "rfi_toolbox_tpu.cli",
    "rfi_toolbox_tpu.visualization",
]


@pytest.mark.parametrize("name", CORE_MODULES)
def test_direct_submodule_import(name):
    assert importlib.import_module(name) is not None


def test_lazy_getattr_all_modules():
    import rfi_toolbox_tpu

    for name in rfi_toolbox_tpu._LAZY_MODULES:
        assert getattr(rfi_toolbox_tpu, name) is not None


def test_reference_path_aliases():
    """Reference import paths work verbatim after s/rfi_toolbox/
    rfi_toolbox_tpu/."""
    from rfi_toolbox_tpu.core import RFISimulator  # noqa: F401
    from rfi_toolbox_tpu.data_generation import (  # noqa: F401
        RawPatchDataset,
        SyntheticDataGenerator,
    )
    from rfi_toolbox_tpu.datasets import BatchWriter, TorchDataset  # noqa: F401
    from rfi_toolbox_tpu.preprocessing import (  # noqa: F401
        GPUPreprocessor,
        Preprocessor,
        patchify,
    )
    from rfi_toolbox_tpu.scripts import normalize_rfi_data  # noqa: F401

    # alias classes ARE the canonical ones
    from rfi_toolbox_tpu.preprocess import Preprocessor as Canonical

    assert Preprocessor is Canonical


def test_fresh_import_isolation():
    """Package import works from a clean sys.modules state (the lazy
    __getattr__ must not depend on import order)."""
    saved = {k: v for k, v in sys.modules.items()
             if k.startswith("rfi_toolbox_tpu")}
    try:
        for k in list(saved):
            del sys.modules[k]
        mod = importlib.import_module("rfi_toolbox_tpu")
        assert mod.evaluation is not None
        assert mod.__version__
    finally:
        sys.modules.update(saved)


def test_unknown_attribute_raises():
    import rfi_toolbox_tpu

    with pytest.raises(AttributeError):
        _ = rfi_toolbox_tpu.not_a_module
