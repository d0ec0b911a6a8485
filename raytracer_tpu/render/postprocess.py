"""Color pipeline: averaged radiance → gamma-2 → 8-bit RGB.

Reference: camera.go:212-215 applies ToGamma2 (sqrt, vec3.go:162-166) then
ToRGB (clamp [0,1], × 255.999, vec3.go:145-152) and truncates to int when
formatting (vec3.go:141-143).
"""

from __future__ import annotations

import jax.numpy as jnp


def to_gamma2(rgb):
    """sqrt tonemap (vec3.go:162-166). Input non-negative linear radiance."""
    return jnp.sqrt(jnp.maximum(rgb, 0.0))


def to_u8(rgb_linear):
    """Full pipeline: gamma-2 then clamp/scale/truncate (vec3.go:145-152)."""
    g = to_gamma2(rgb_linear)
    scaled = jnp.clip(g, 0.0, 1.0) * 255.999
    return scaled.astype(jnp.uint8)
