"""rfi_toolbox_tpu - TPU-native framework for ML-based RFI detection.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
``preshanth/rfi_toolbox`` (reference: /root/reference), designed
array-first for TPU hardware:

- everything after host-side MS ingest is a pure function over batched
  device arrays, ``vmap``-ed and ``jit``-ed over a ``jax.sharding.Mesh``;
- the hot preprocessing path (complex magnitude -> log -> gradient ->
  3-channel extraction -> ImageNet normalization) runs as one fused
  Pallas kernel per 128x128 patch (``rfi_toolbox_tpu.ops``);
- models are Flax modules in NHWC layout with bfloat16 compute;
- parallelism is expressed with shardings over a device mesh, not
  process pools.

Subpackages:
- io: Measurement Set I/O (host-staged; casatools optional, FakeMS for tests)
- evaluation: segmentation metrics and flagging-quality statistics
- preprocess: waterfall -> patch pipeline (jnp reference + Pallas fused path)
- ops: Pallas TPU kernels and low-level flagging ops
- synth: synthetic RFI generators (config-driven + coherent-phase simulator)
- models: Flax UNet family and segmentation models
- train: optax training loops, losses, Orbax checkpointing
- data: array dataset containers, batch writers, sample-dir datasets
- parallel: device mesh and sharding helpers
- config: YAML config loading and validation
- cli: console entry points
- serving: AOT-compiled fixed-shape production predictors
- visualization: dashboards and plotting (host-side)

Example:
    from rfi_toolbox_tpu.evaluation import evaluate_segmentation
    from rfi_toolbox_tpu.preprocess import Preprocessor
"""

__version__ = "0.1.0"

_LAZY_MODULES = {
    "utils",
    "evaluation",
    "preprocess",
    "ops",
    "synth",
    "models",
    "train",
    "data",
    "parallel",
    "config",
    "io",
    "cli",
    "native",
    "serving",
    "visualization",
    # reference-path compatibility aliases
    "core",
    "preprocessing",
    "datasets",
    "data_generation",
    "scripts",
}


def __getattr__(name):
    """Lazy subpackage import (keeps core import light; mirrors the
    reference's degradation behavior, rfi_toolbox/__init__.py:32-52,
    without the debug prints)."""
    if name in _LAZY_MODULES:
        import importlib

        mod = importlib.import_module(f".{name}", __name__)
        globals()[name] = mod
        return mod
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


def __dir__():
    return sorted(set(globals()) | _LAZY_MODULES)
