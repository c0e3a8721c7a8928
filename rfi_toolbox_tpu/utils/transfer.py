"""Host<->device transfer helpers.

Some TPU runtimes (including the experimental PJRT backend in this
environment) do not implement complex-dtype host<->device transfers.
Visibilities are complex, so transfers are staged as separate
real/imaginary float planes and recombined with ``lax.complex`` on
device (and split before device->host copies).
"""

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["to_device", "to_host"]


def to_device(array, dtype=None):
    """Host array -> device array; complex input is staged as two real
    planes (complex64 on device unless ``dtype`` says complex128)."""
    if isinstance(array, np.ndarray) and np.iscomplexobj(array):
        target = np.complex64 if dtype is None else dtype
        ftype = jnp.float64 if target == np.complex128 else jnp.float32
        re = jax.device_put(np.ascontiguousarray(array.real)).astype(ftype)
        im = jax.device_put(np.ascontiguousarray(array.imag)).astype(ftype)
        return jax.lax.complex(re, im)
    out = jnp.asarray(array)
    return out.astype(dtype) if dtype is not None else out


def to_host(array):
    """Device array -> numpy; complex arrays are split into real planes
    for the copy and recombined on host."""
    if hasattr(array, "dtype") and jnp.iscomplexobj(array):
        re = np.asarray(jnp.real(array))
        im = np.asarray(jnp.imag(array))
        return re + 1j * im
    return np.asarray(array)
