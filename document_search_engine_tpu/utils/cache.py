"""Persistent XLA compilation cache.

On the axon platform the first execution of each compiled graph pays a
remote compile/load round-trip measured in minutes; the persistent cache
cuts repeat runs to milliseconds. Called by bench.py, the CLI, and
__graft_entry__ before any jit executes.
"""
from __future__ import annotations

import os

_DEFAULT = os.path.expanduser("~/.jax_cache")


def enable_persistent_cache(path: str | None = None) -> None:
    import jax

    path = path or os.environ.get("JAX_COMPILATION_CACHE_DIR", _DEFAULT)
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass


def apply_env_platform() -> None:
    """Honor a JAX_PLATFORMS env request. The axon sitecustomize
    force-sets jax_platforms to "axon,cpu" at import, overriding the
    env var — a JAX_PLATFORMS=cpu smoke run would silently grab the
    TPU. Called by bench.py and the tools/ scripts after importing jax
    (same fix as __graft_entry__ / tests/conftest.py)."""
    import jax

    env_plat = os.environ.get("JAX_PLATFORMS", "")
    if env_plat and str(jax.config.jax_platforms) != env_plat:
        try:
            jax.config.update("jax_platforms", env_plat)
        except Exception:
            pass
