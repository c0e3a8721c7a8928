"""Platform selection helper.

Some environments preload jax at interpreter startup (a sitecustomize
registering a TPU PJRT plugin), which freezes the platform before user
code can set ``JAX_PLATFORMS``. This helper re-applies the choice via
``jax.config`` so CLI ``--device`` flags and the env var both work.
"""

import os

__all__ = ["configure_platform"]


def configure_platform(device=None):
    """Pin the JAX platform.

    Priority: explicit ``device`` arg ('cpu'/'tpu'/...), then the
    ``JAX_PLATFORMS`` env var. 'tpu' maps to the ambient TPU platform
    (left untouched so plugin-specific names keep working).
    """
    import jax

    choice = device or os.environ.get("JAX_PLATFORMS")
    if not choice or choice == "tpu":
        return
    jax.config.update("jax_platforms", choice)
