"""Multi-host initialization helpers.

The reference has no distributed backend (SURVEY.md §2.8b). On TPU pods
the recipe is: ``jax.distributed.initialize()`` per host (DCN control
plane), then a global mesh over all devices with data sharded by host
and collectives riding ICI within each slice.
"""

import jax

__all__ = ["initialize_distributed", "global_mesh", "process_info"]


def initialize_distributed(coordinator_address=None, num_processes=None,
                           process_id=None):
    """Initialize multi-host JAX. On TPU pods with standard env vars the
    arguments are auto-detected; no-op in single-process settings."""
    if jax.process_count() > 1:
        return  # already initialized
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (ValueError, RuntimeError):
        # single-host / no coordinator configured: run locally
        pass


def global_mesh(axis_names=("data", "model"), model_axis=1):
    """Mesh over ALL devices across hosts: data axis spans hosts (DCN +
    ICI), model axis stays within a host's chips (ICI only)."""
    from .mesh import make_mesh

    n = len(jax.devices())
    if n % model_axis:
        raise ValueError(f"{n} devices not divisible by model axis {model_axis}")
    return make_mesh(shape=(n // model_axis, model_axis),
                     axis_names=axis_names)


def process_info():
    """(process_index, process_count, local_device_count)."""
    return jax.process_index(), jax.process_count(), jax.local_device_count()
