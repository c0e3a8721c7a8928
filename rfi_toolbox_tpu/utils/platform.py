"""Platform selection helper.

Some environments preload jax at interpreter startup (a sitecustomize
registering a TPU PJRT plugin), which freezes the platform before user
code can set ``JAX_PLATFORMS``. This helper re-applies the choice via
``jax.config`` so CLI ``--device`` flags and the env var both work.
"""

import os

__all__ = ["configure_platform", "enable_compilation_cache"]


def configure_platform(device=None, compilation_cache=True):
    """Pin the JAX platform (and enable the persistent compile cache).

    Priority: explicit ``device`` arg ('cpu'/'tpu'/...), then the
    ``JAX_PLATFORMS`` env var. 'tpu' maps to the ambient TPU platform
    (left untouched so plugin-specific names keep working). The
    compilation cache (30-60 s/shape saved on rerun against the remote
    TPU) is on for every CLI; disable with ``compilation_cache=False``
    or ``JAX_COMPILATION_CACHE_DIR=""``.
    """
    import jax

    if compilation_cache and os.environ.get(
        "JAX_COMPILATION_CACHE_DIR"
    ) != "":
        enable_compilation_cache()
    choice = device or os.environ.get("JAX_PLATFORMS")
    if not choice or choice == "tpu":
        return
    jax.config.update("jax_platforms", choice)


def enable_compilation_cache(cache_dir=None):
    """Persist compiled XLA programs across processes.

    Remote-TPU compiles run 30-60 s per new shape (CLAUDE.md); caching
    them on disk makes every CLI/bench rerun with repeated shapes start
    hot. No-op if the jax version lacks the config knobs.
    """
    import jax

    cache_dir = cache_dir or os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "rfi_jax_cache"),
    )
    if not cache_dir:  # "" is the documented opt-out
        return None
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except (AttributeError, OSError):  # older jax / read-only fs
        return None
    return cache_dir
