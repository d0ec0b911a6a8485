"""Test config: force CPU with 8 virtual devices so sharding logic is tested
without a pod (SURVEY.md §4.5). Must run before jax imports."""

import os

# NOTE: this image pins JAX_PLATFORMS=axon (the TPU tunnel) in the
# environment and the plugin wins over a re-exported env var, so the reliable
# way to force CPU is jax.config *before* backend initialization.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# The PJRT CPU client's execute pool defaults to ~the core count; the Pallas
# TPU interpreter barriers every pallas_call across ALL devices, so an
# 8-device fused kernel+collective program deadlocks on a 4-core host unless
# the pool is sized past the device count (XLA reads PJRT_NPROC; must be set
# BEFORE the backend initializes — docs/PERF_NOTES.md round 4).
os.environ.setdefault("PJRT_NPROC", "16")

import jax

jax.config.update("jax_platforms", "cpu")
# Key the persistent cache by this host's CPU flags: the machine pool is
# heterogeneous, and XLA:CPU AOT executables compiled on a host with e.g.
# +prefer-no-scatter SEGFAULT when deserialized on one without (observed
# round 5: hard crash inside compilation_cache.get_executable_and_time).
import hashlib

try:
    _flags = [
        ln for ln in open("/proc/cpuinfo").read().splitlines()
        if ln.startswith("flags")
    ][0]
except Exception:  # pragma: no cover
    _flags = "unknown"
_cpu_key = hashlib.sha1(_flags.encode()).hexdigest()[:10]
jax.config.update("jax_compilation_cache_dir", f"/tmp/jax_cache_{_cpu_key}")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
