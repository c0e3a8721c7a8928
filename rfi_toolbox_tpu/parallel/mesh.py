"""Device mesh and sharding helpers.

The reference has no distributed strategy at all — its only parallelism
is a CPU multiprocessing.Pool (SURVEY.md §2.8b). Here parallelism is
expressed the TPU way: a ``jax.sharding.Mesh`` over the chips with
named axes, shardings annotated on arrays, and XLA inserting the
collectives over ICI.

Axes:
- ``data``: batch-dim data parallelism (patches are embarrassingly
  parallel — this replaces the reference's Pool fan-out).
- ``model``: tensor parallelism over conv output-feature dims of the
  widest UNet layers (param + activation sharding; XLA all-reduces the
  partial sums).

Spatial sharding of large waterfalls for the preprocessing stage is in
:func:`shard_waterfalls` (channel axis over ``data``): the preprocess
stencil needs only a 1-pixel halo and MAD is per-patch, so patch-grid
boundaries align with shard boundaries and no halo exchange is needed
for patch_size-multiple shards.
"""

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh",
    "replicated",
    "batch_sharding",
    "shard_batch",
    "shard_params_tensor_parallel",
    "shard_waterfalls",
]


def make_mesh(shape=None, axis_names=("data", "model"), devices=None):
    """Create a Mesh over the available devices.

    Args:
        shape: tuple matching axis_names; None -> all devices on the
            first axis, 1 on the rest.
        axis_names: mesh axis names, default ('data', 'model').
        devices: explicit device list (default jax.devices()).
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if shape is None:
        shape = (n,) + (1,) * (len(axis_names) - 1)
    if int(np.prod(shape)) != n:
        raise ValueError(f"mesh shape {shape} != {n} devices")
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axis_names)


def replicated(mesh):
    """Fully-replicated sharding."""
    return NamedSharding(mesh, P())


def batch_sharding(mesh, axis="data"):
    """Shard the leading (batch) dimension over ``axis``."""
    return NamedSharding(mesh, P(axis))


def shard_batch(batch, mesh, axis="data"):
    """Device-put a pytree of batch arrays with leading-dim sharding.

    Arrays whose leading dim is not divisible by the mesh axis are
    replicated instead (a 2-sample batch on an 8-chip mesh still runs,
    just without data parallelism for that step).
    """
    sh = batch_sharding(mesh, axis)
    rep = replicated(mesh)
    n = mesh.shape[axis]

    def put(a):
        target = sh if (hasattr(a, "shape") and a.shape and a.shape[0] % n == 0) \
            else rep
        return jax.device_put(a, target)

    return jax.tree.map(put, batch)


def shard_params_tensor_parallel(params, mesh, min_features=256, axis="model"):
    """Tensor-parallel sharding rule for conv params.

    Shards the output-feature (last) axis of convolution kernels whose
    output features are both >= ``min_features`` and divisible by the
    mesh axis size; everything else is replicated. With the matching
    activation sharding this makes XLA partition the widest UNet layers
    (bottleneck convs) across the ``model`` axis.
    """
    axis_size = mesh.shape[axis]

    def rule(x):
        if (
            hasattr(x, "ndim")
            and x.ndim >= 2
            and x.shape[-1] >= min_features
            and x.shape[-1] % axis_size == 0
        ):
            spec = P(*([None] * (x.ndim - 1) + [axis]))
        else:
            spec = P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(rule, params)


def shard_waterfalls(waterfalls, mesh, axis="data"):
    """Shard (B, ..., C, T) waterfalls: batch over ``axis``.

    For single large observations (B smaller than the axis), reshape the
    flattened (baseline x pol) dim into the batch position first — the
    preprocessing pipeline is elementwise/per-patch so any leading-dim
    sharding is communication-free until the gather.
    """
    return jax.device_put(waterfalls, NamedSharding(mesh, P(axis)))
