"""Test configuration: run everything on a virtual 8-device CPU mesh.

The env vars must be set before jax is first imported, which pytest guarantees
by loading conftest.py before any test module.
"""
import os

# AURALIS_ONCHIP=1 keeps the real TPU backend so the on-chip integration
# tier (tests/integration/test_onchip_sustained.py) can run against the
# chip; the default is the hermetic virtual-CPU mesh.
_ONCHIP = os.environ.get("AURALIS_ONCHIP", "") == "1"
if not _ONCHIP:
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    os.environ.setdefault(
        "XLA_FLAGS",
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8",
    )

import hashlib

import jax


def _host_fingerprint() -> str:
    """XLA's CPU executables are AOT-compiled for the build host's CPU
    features, and JAX's persistent-cache key does NOT include them — loading
    an executable cached on a different host segfaults the interpreter
    (observed: cpu_aot_loader feature-mismatch crash inside
    compilation_cache.get_executable_and_time). Key the cache directory by
    the host's CPU flags so a host change gets a fresh cache instead."""
    try:
        with open("/proc/cpuinfo") as f:
            flags = next((line for line in f if line.startswith("flags")), "")
    except OSError:
        flags = ""
    import jaxlib

    seed = flags + getattr(jaxlib, "__version__", "")
    return hashlib.md5(seed.encode()).hexdigest()[:12]


# The environment's axon site hook force-sets jax_platforms="axon,cpu" at
# interpreter start; override it back to hermetic CPU before first backend use.
if not _ONCHIP:
    jax.config.update("jax_platforms", "cpu")
if not _ONCHIP and os.environ.get("AURALIS_TEST_NO_CACHE", "") != "1":
    jax.config.update(
        "jax_compilation_cache_dir", f"/root/.cache/jax_test_cache_{_host_fingerprint()}"
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import gc

import numpy as np
import pytest


@pytest.fixture(scope="module", autouse=True)
def _shallow_executable_depth():
    """Bound the number of live XLA executables in the test process.

    Reading a large persistent-cache entry into a process already holding
    ~1400 loaded CPU executables segfaults inside
    compilation_cache.get_executable_and_time (deterministic at suite
    position ~97%, test_w8a8's teacher-forced scan; the SAME entry loads
    fine into a fresh process — an XLA CPU AOT-loader depth problem, most
    plausibly code-model relocation range). Clearing jit caches after each
    test module keeps every cache *read* shallow; the warm disk cache makes
    the re-loads cheap."""
    yield
    jax.clear_caches()
    gc.collect()


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
