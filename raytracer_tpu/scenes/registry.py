"""Scene registry keyed by name — the CLI-facing replacement for the
reference's compile-time scene constant switch (main.go:13-20, 55-69)."""

from __future__ import annotations

from raytracer_tpu.scenes import builders

SCENES = {
    "rand_spheres": builders.rand_spheres,
    "earth": builders.earth,
    "perlin": builders.perlin_demo,
    "quads": builders.quad_demo,
    "simple_light": builders.simple_light,
    "cornell": builders.cornell_box,
    "one_weekend_final": builders.one_weekend_final,
    "rand_spheres_large": builders.rand_spheres_large,
    "quad_field": builders.quad_field,
}


def get_scene(name: str, seed: int = 0, **overrides):
    """Build a registered scene. `overrides` pass through to the builder
    (width/spp/max_depth...)."""
    if name not in SCENES:
        raise KeyError(f"unknown scene {name!r}; available: {sorted(SCENES)}")
    return SCENES[name](seed, **overrides)
