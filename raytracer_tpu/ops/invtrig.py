"""Branchless inverse-trig for Pallas TPU kernels.

Mosaic does not lower `atan`/`atan2`/`acos`/`asin` (probed on v5e: every one
raises "Unimplemented primitive in Pallas TPU lowering"), but the in-kernel
image-texture path needs the reference's spherical UV map
(hittables.go:122-126): theta = acos(-y), phi = atan2(-z, x) + pi.

This module provides select-based (branchless) implementations built from a
Cephes-style single-precision atan kernel: two-step range reduction at
tan(pi/8) and tan(3pi/8), then a degree-9 odd minimax polynomial. Max error
vs numpy is ~1e-6 rad (checked in tests/test_invtrig.py) — against a texel
granularity of 2*pi/W (~1.2e-2 rad at W=512) a 1e-6 phase error can flip a
nearest-neighbor texel pick only within ~1e-4 of a texel boundary, i.e.
measure-zero for rendering purposes.

Pure jnp on any array shape, so the same code runs inside Mosaic kernels,
under the Pallas interpreter, and in plain XLA for tests.
"""

from __future__ import annotations

import jax.numpy as jnp

_PI = 3.141592653589793
_PI_2 = 1.5707963267948966
_PI_4 = 0.7853981633974483
_TAN_PI_8 = 0.4142135623730950  # tan(pi/8)
_TAN_3PI_8 = 2.414213562373095  # tan(3pi/8)


def atan(x):
    """Elementwise arctangent, f32, branchless (Cephes atanf scheme)."""
    ax = jnp.abs(x)
    big = ax > _TAN_3PI_8
    mid = jnp.logical_and(ax > _TAN_PI_8, jnp.logical_not(big))
    y0 = jnp.where(big, _PI_2, jnp.where(mid, _PI_4, 0.0))
    # Reduced argument: -1/ax (big), (ax-1)/(ax+1) (mid), ax (small). The
    # division guards keep every lane finite regardless of which branch wins.
    xr_big = -1.0 / jnp.where(big, ax, 1.0)
    xr_mid = (ax - 1.0) / (ax + 1.0)
    xr = jnp.where(big, xr_big, jnp.where(mid, xr_mid, ax))
    z = xr * xr
    p = (
        ((8.05374449538e-2 * z - 1.38776856032e-1) * z + 1.99777106478e-1) * z
        - 3.33329491539e-1
    ) * z * xr + xr
    return jnp.where(x < 0.0, -(y0 + p), y0 + p)


def atan2(y, x):
    """Elementwise atan2 with IEEE-style edge handling: atan2(0, 0) = 0,
    atan2(+-y, 0) = +-pi/2, atan2(0, x<0) = pi."""
    xs = jnp.where(x == 0.0, 1e-30, x)
    base = atan(y / xs)
    # Exact x == 0 column: the 1e-30 substitute relies on y/1e-30 overflowing
    # past tan(3pi/8), which fails for |y| <~ 2.4e-30 — select the true +-pi/2
    # instead so the IEEE contract holds for ALL nonzero y.
    base = jnp.where(
        jnp.logical_and(x == 0.0, y != 0.0),
        jnp.where(y < 0.0, -_PI_2, _PI_2),
        base,
    )
    # Sign of y including signed zero (atan2(-0.0, x<0) = -pi): IEEE division
    # by a signed zero yields a signed infinity, so 1/y distinguishes -0.0
    # without a bit-cast (which Mosaic may not lower).
    rec = 1.0 / jnp.where(y == 0.0, y, 1.0)
    y_neg = jnp.logical_or(y < 0.0, jnp.logical_and(y == 0.0, rec < 0.0))
    corr = jnp.where(x < 0.0, jnp.where(y_neg, -_PI, _PI), 0.0)
    return base + corr


def acos(x):
    """Elementwise arccos on [-1, 1] via acos(x) = atan2(sqrt(1-x^2), x)."""
    s = jnp.sqrt(jnp.maximum(1.0 - x * x, 0.0))
    return atan2(s, x)
