"""Persistent XLA compilation cache setup.

The axon TPU backend compiles large conv3d graphs slowly (~1 min per
fused 3D conv in-context); the persistent cache turns every subsequent
process's compile into a disk hit (measured 72s -> 5.7s).  Call
``enable_compilation_cache()`` before the first jit.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".jax_cache",
)


def apply_platform_env() -> None:
    """Honor JAX_PLATFORMS even when a site plugin pins another platform.

    On this class of host the axon TPU plugin registers itself on import
    and the env var alone does not win; jax.config must be set too (must
    run before the backend initializes — a no-op afterwards)."""
    plat = os.environ.get("JAX_PLATFORMS")
    if not plat:
        return
    import jax

    try:
        jax.config.update("jax_platforms", plat)
    except RuntimeError:
        pass  # backend already initialized


def enable_compilation_cache(cache_dir: str | None = None) -> str:
    import jax

    apply_platform_env()

    cache_dir = (
        cache_dir
        or os.environ.get("JAX_COMPILATION_CACHE_DIR")
        or _DEFAULT_DIR
    )
    # per-backend subdir: CPU AOT artifacts compiled on a different host
    # profile must not be offered to this host (SIGILL risk)
    try:
        cache_dir = os.path.join(cache_dir, jax.default_backend())
    except Exception:
        pass
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    try:
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    return cache_dir
