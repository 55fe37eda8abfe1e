"""Persistent XLA compilation cache.

On the axon platform the first execution of each compiled graph pays a
remote compile/load round-trip measured in minutes; the persistent cache
cuts repeat runs to milliseconds. Called by bench.py, the CLI, and the
tools/ scripts before any jit executes.

The cache is TPU-only by design. XLA:CPU serialized executables embed
the compile machine's ISA (avx512fp16, amx, ...); loading one on a host
without those features warns and then SIGILLs mid-run (observed: a cache
written on an amx host crashed test_sharded elsewhere), and writing them
segfaulted twice in compilation_cache.put_executable_and_time during the
CPU test suite. CPU compiles are seconds anyway — the cache's reason to
exist is the minutes-per-graph axon tunnel. enable_persistent_cache
therefore refuses to enable on a CPU backend, checking both the
JAX_PLATFORMS request and (for the silent axon->cpu fallback case when
the tunnel is down) the actually-initialized backend, so the shared
cache dir only ever holds host-independent TPU executables.
"""
from __future__ import annotations

import os

_DEFAULT = os.path.expanduser("~/.jax_cache")


def cache_dir(path: str | None = None) -> str:
    """The resolved cache directory (shared across processes/hosts;
    TPU executables only — see module docstring)."""
    return path or os.environ.get("JAX_COMPILATION_CACHE_DIR", _DEFAULT)


def enable_persistent_cache(path: str | None = None) -> None:
    import jax

    plats = os.environ.get("JAX_PLATFORMS", "") or str(
        getattr(jax.config, "jax_platforms", "") or ""
    )
    if plats.split(",")[0].strip() == "cpu":
        return
    try:
        # initializes the backend (which every caller does moments
        # later anyway); catches the silent cpu fallback when the
        # tunnel is down and JAX_PLATFORMS is unset
        if jax.default_backend() == "cpu":
            return
    except Exception:
        return

    path = cache_dir(path)
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
