"""Test env: CPU backend with 8 virtual devices (SURVEY.md §4).

Must run before any jax import: correctness tests never depend on the TPU
being up (the axon PJRT platform is experimental). Pallas kernels run with
interpret=True under this backend.
"""
import os
import sys

# DSE_TPU_TESTS=1 leaves the real TPU platform in place (for
# tests/test_tpu_smoke.py); default is the CPU backend with 8 virtual
# devices so correctness never depends on the TPU being up.
_use_tpu = os.environ.get("DSE_TPU_TESTS") == "1"
if not _use_tpu:
    os.environ["JAX_PLATFORMS"] = "cpu"
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8"
        ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The axon sitecustomize calls register(), which force-sets the
# jax_platforms config to "axon,cpu" — overriding the env var.
import jax  # noqa: E402

if not _use_tpu:
    jax.config.update("jax_platforms", "cpu")
