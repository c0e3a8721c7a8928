"""Tests for utils (profiling, transfers, platform, errors) and the
tensor-parallel sharding rule."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rfi_toolbox_tpu.parallel import make_mesh, shard_params_tensor_parallel
from rfi_toolbox_tpu.utils import (
    ConfigValidationError,
    DataShapeError,
    RFIToolboxError,
    StepTimer,
    annotate,
    to_device,
    to_host,
)


def test_error_hierarchy():
    assert issubclass(ConfigValidationError, RFIToolboxError)
    assert issubclass(DataShapeError, RFIToolboxError)
    with pytest.raises(RFIToolboxError):
        raise ConfigValidationError("x")


def test_step_timer(rng):
    timer = StepTimer(sync=True, skip_first=1)
    for _ in range(4):
        with timer.step(items=10):
            jnp.sum(jnp.ones((64, 64))).block_until_ready()
    s = timer.summary()
    assert s["steps"] == 3  # first skipped
    assert s["mean_ms"] > 0
    assert s["items_per_sec"] > 0
    timer.reset()
    assert timer.summary() == {"steps": 0}


def test_annotate_scope_runs():
    with annotate("unit-test-scope"):
        assert float(jnp.sum(jnp.ones(4))) == 4.0


def test_transfer_complex_roundtrip(rng):
    x = (rng.normal(size=(8, 8)) + 1j * rng.normal(size=(8, 8))).astype(
        np.complex64
    )
    dev = to_device(x)
    assert jnp.iscomplexobj(dev)
    back = to_host(dev)
    np.testing.assert_allclose(back, x, rtol=1e-6)
    # complex128 fidelity path downcasts to complex64 by default
    x128 = x.astype(np.complex128)
    assert to_device(x128).dtype == jnp.complex64


def test_transfer_real_passthrough(rng):
    x = rng.normal(size=(4, 4)).astype(np.float32)
    np.testing.assert_array_equal(to_host(to_device(x)), x)


def test_tensor_parallel_sharding_rule():
    mesh = make_mesh(shape=(4, 2), axis_names=("data", "model"))
    params = {
        "wide": jnp.zeros((3, 3, 128, 512)),   # sharded (512 % 2 == 0)
        "narrow": jnp.zeros((3, 3, 3, 32)),    # replicated (too small)
        "odd": jnp.zeros((3, 3, 128, 257)),    # replicated (indivisible)
        "bias": jnp.zeros((512,)),             # 1-D: replicated
    }
    sharded = shard_params_tensor_parallel(params, mesh, min_features=256)
    specs = {k: v.sharding.spec for k, v in sharded.items()}
    assert specs["wide"][-1] == "model"
    assert all(s is None for s in specs["narrow"])
    assert all(s is None for s in specs["odd"])
    # every array lives on all 8 devices
    assert all(len(v.sharding.device_set) == 8 for v in sharded.values())


def test_trace_writes_profile(tmp_path):
    """jax.profiler trace context actually produces trace artifacts."""
    import jax.numpy as jnp

    from rfi_toolbox_tpu.utils import trace

    with trace(tmp_path / "tr"):
        jnp.arange(128).sum().block_until_ready()
    written = list((tmp_path / "tr").rglob("*"))
    assert any(p.is_file() for p in written), written
