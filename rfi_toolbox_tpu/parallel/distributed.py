"""Multi-host initialization helpers.

The reference has no distributed backend (SURVEY.md §2.8b). On TPU pods
the recipe is: ``jax.distributed.initialize()`` per host (DCN control
plane), then a global mesh over all devices with data sharded by host
and collectives riding ICI within each slice.
"""

import logging

import jax

logger = logging.getLogger(__name__)

__all__ = ["initialize_distributed", "global_mesh", "process_info"]


def initialize_distributed(coordinator_address=None, num_processes=None,
                           process_id=None, **kwargs):
    """Initialize multi-host JAX.

    With explicit arguments (or on TPU pods where env vars auto-detect
    them), connects this process to the coordinator. Returns True when
    running multi-process afterwards.

    Failure semantics: when a coordinator was explicitly requested, a
    failed init RAISES — a misconfigured pod must not silently degrade
    to single-host training (it would train on a fraction of the data
    and silently produce different results). Only the argument-free
    auto-detect call falls back to single-process, with a loud warning.
    """
    # NB: do not touch jax.process_count() here — it initializes the XLA
    # backend, after which jax.distributed.initialize refuses to run.
    if jax.distributed.is_initialized():
        return jax.process_count() > 1
    # any explicitly-specified topology argument means the caller asked
    # for multi-process; a coordinator taken from env vars with only
    # num_processes/process_id passed must fail as loudly as a full
    # explicit spec
    explicit = any(
        a is not None for a in (coordinator_address, num_processes, process_id)
    )
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
            **kwargs,  # e.g. initialization_timeout=<seconds>
        )
    except (ValueError, RuntimeError) as e:
        if explicit:
            logger.error(
                "jax.distributed.initialize(coordinator=%s, n=%s, id=%s) "
                "FAILED: %s", coordinator_address, num_processes, process_id, e,
            )
            raise
        logger.warning(
            "multi-host auto-detect failed (%s); continuing single-process. "
            "Pass coordinator_address explicitly to make this an error.", e,
        )
        return False
    return jax.process_count() > 1


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
