"""Persistent XLA compilation cache.

On the axon platform the first execution of each compiled graph pays a
remote compile/load round-trip measured in minutes; the persistent cache
cuts repeat runs to milliseconds. Called by bench.py, the CLI, and
__graft_entry__ before any jit executes.
"""
from __future__ import annotations

import hashlib
import os
import platform

_DEFAULT = os.path.expanduser("~/.jax_cache")


def _host_fingerprint() -> str:
    """Short hash of the host's CPU features + kernel. XLA:CPU AOT
    executables embed the compile machine's ISA (avx512fp16, amx, ...);
    loading them on a host without those features warns and then
    SIGILLs/SIGSEGVs mid-run (observed: cache written on an
    amx/avx512fp16 host crashed test_sharded on a host without them).
    The TPU executables are host-independent, but a per-host cache dir
    is the only split that also protects the axon->cpu fallback path."""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    feats = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
            else:
                feats = platform.machine()
    except OSError:
        feats = platform.machine()
    return hashlib.sha1(feats.encode()).hexdigest()[:12]


def cache_dir(path: str | None = None) -> str:
    """The resolved per-host cache directory (see _host_fingerprint)."""
    path = path or os.environ.get("JAX_COMPILATION_CACHE_DIR", _DEFAULT)
    return os.path.join(path, f"h-{_host_fingerprint()}")


def enable_persistent_cache(path: str | None = None) -> None:
    import jax

    # CPU backend: skip. Compiles are seconds (vs minutes through the
    # axon tunnel, the cache's reason to exist), and writing XLA:CPU
    # executables segfaulted twice in compilation_cache
    # .put_executable_and_time during the full test suite on this host
    # (the in-process CLI test enables the cache for the rest of the
    # session; the 8-virtual-device shard_map program crashed the
    # process mid-serialize).
    plats = os.environ.get("JAX_PLATFORMS", "") or str(
        getattr(jax.config, "jax_platforms", "") or ""
    )
    if plats.split(",")[0].strip() == "cpu":
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
