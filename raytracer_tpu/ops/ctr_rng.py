"""Counter-based RNG shared bit-exactly between Pallas kernels and XLA.

The persistent kernel's production RNG is the per-core hardware PRNG
(`pltpu.prng_random_bits`) — fast, but stateful and impossible to reproduce
from XLA. The gradient path needs the opposite property: the differentiable
tape REPLAY (diff/bucketed.py) must regenerate exactly the uniforms the
kernel forward consumed for any SUBSET of lanes, outside the kernel. The
fix is a stateless counter RNG: every uniform is a pure function

    u = uniform(seed, lane, ctr)          # ctr indexes the draw

implemented in plain int32 jnp arithmetic that lowers identically under
Mosaic (inside a Pallas kernel) and XLA (host/replay side):

* int32 multiply/add wrap in two's complement on both (uint32 low bits);
* logical right shift is written as arithmetic shift + mask (Mosaic has no
  uint32 vectors — same trick as the in-kernel Perlin hash,
  ops/persistent_kernel.py);
* the U[0,1) construction keeps 23 mantissa bits, matching the kernel's
  `_uniform` (bits & 0x7FFFFF) * 2^-23.

Mixer: two rounds of the murmur3 finalizer (fmix32; Austin Appleby, public
domain) over (seed ^ lane*phi) then (state ^ ctr*c1) — full avalanche per
round, so lane/ctr neighbors decorrelate. Not cryptographic; quality is
"Monte Carlo rendering" grade (tests/test_ctr_rng.py pins moments and
stratification).

Draw-index layout (the contract between the kernel tape mode and the
replay — diff/bucketed.py):

    ctr 0..3                 camera uniforms [jitter x, jitter y, disk r-u,
                             disk phi-u] (core.camera.camera_rays layout)
    ctr 4 + 3*bounce + j     per-bounce shading uniforms j in [0, 3)
                             (materials.UNIFORMS_PER_BOUNCE layout:
                             unit-sphere u0, u1, dielectric coin)

`lane` is the global sample id (sample_k * n_pixels + pixel), NOT the
physical kernel lane, so any bucket of lanes can regenerate its own stream.
"""

from __future__ import annotations

import jax.numpy as jnp

from raytracer_tpu.materials.materials import UNIFORMS_PER_BOUNCE

CAM_DRAWS = 4  # camera_rays consumes (N, 4) uniforms


def _i32c(v: int) -> int:
    """Python uint32 constant -> equivalent signed int32 two's complement."""
    return v - (1 << 32) if v >= (1 << 31) else v


_M1 = _i32c(0x85EBCA6B)
_M2 = _i32c(0xC2B2AE35)
_PHI = _i32c(0x9E3779B9)
_SEED_XOR = _i32c(0x3C6EF372)


def _lsr(x, k: int):
    """Logical right shift on int32 (arithmetic shift + mask)."""
    return (x >> k) & ((1 << (32 - k)) - 1)


def fmix32(x):
    """murmur3 finalizer: full-avalanche 32-bit mix (int32 in/out)."""
    x = x ^ _lsr(x, 16)
    x = x * _M1
    x = x ^ _lsr(x, 13)
    x = x * _M2
    x = x ^ _lsr(x, 16)
    return x


def hash_i32(seed, lane, ctr):
    """Mixed int32 word for draw `ctr` of stream (seed, lane).

    All args int32-coercible (scalars or broadcastable arrays)."""
    seed = jnp.asarray(seed, jnp.int32)
    lane = jnp.asarray(lane, jnp.int32)
    ctr = jnp.asarray(ctr, jnp.int32)
    x = fmix32((seed ^ _SEED_XOR) + lane * _PHI)
    x = fmix32(x ^ (ctr * _M1))
    return x


def uniform(seed, lane, ctr):
    """U[0,1) f32, 23-bit mantissa — bit-identical to the kernel's
    `_uniform` construction applied to hash_i32."""
    bits = hash_i32(seed, lane, ctr)
    return (bits & 0x7FFFFF).astype(jnp.float32) * (1.0 / 8388608.0)


def camera_uniforms(seed, lane_ids):
    """(L, 4) camera-ray uniforms for the given sample ids (ctr 0..3)."""
    j = jnp.arange(CAM_DRAWS, dtype=jnp.int32)[None, :]
    return uniform(seed, lane_ids.astype(jnp.int32)[:, None], j)


def bounce_uniform_seq(seed, lane_ids, max_depth: int):
    """(max_depth, L, UNIFORMS_PER_BOUNCE) shading uniforms — the
    `uniform_seq` layout integrator.wavefront.trace consumes. Prefix-stable
    in depth by construction (each (bounce, j) has its own counter)."""
    b = jnp.arange(max_depth, dtype=jnp.int32)[:, None, None]
    j = jnp.arange(UNIFORMS_PER_BOUNCE, dtype=jnp.int32)[None, None, :]
    lane = lane_ids.astype(jnp.int32)[None, :, None]
    return uniform(seed, lane, CAM_DRAWS + b * UNIFORMS_PER_BOUNCE + j)
