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
# NO persistent compilation cache for the CPU test suite (round 5): the
# XLA:CPU AOT deserializer SEGFAULTS the whole pytest process on bad cache
# entries — observed both from executables compiled on a pool host with
# different CPU features (+prefer-no-scatter) and from entries truncated
# by a killed previous run. Hard crashes inside
# compilation_cache.get_executable_and_time cost two full suite runs; the
# cross-run compile savings are not worth it. (The TPU paths keep their
# own cache; remote-compiled executables are not affected.)

import numpy as np
import pytest


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop compiled executables after each test module: ~197 tests of
    accumulated XLA:CPU JIT state in one process reproducibly SEGFAULTS
    the compiler around test #160 (observed round 5 at the same position
    in three consecutive full-suite runs, in whatever path produced the
    next executable — cache read or fresh compile — while the same module
    passes standalone). Per-module clearing keeps within-module reuse and
    resets the compiler state well before the danger zone."""
    yield
    jax.clear_caches()


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
