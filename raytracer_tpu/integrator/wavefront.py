"""Wavefront path-trace integrator: bounce recursion → iterative masked loop.

This is the heart of the rebuild (SURVEY.md §2.1 "Recursive integrator").
The reference integrates radiance by recursion per ray
(/root/reference/internal/ray.go:32-54):

    depth <= 0            -> black
    miss                  -> background color
    hit, no scatter       -> emitted
    hit, scatter          -> emitted + attenuation ⊙ recurse(scattered)

On TPU the recursion becomes an iterative wavefront over a whole ray batch:
a `throughput` product replaces the attenuation multiply chain, `radiance`
accumulates emitted/background terms, and an `alive` mask replaces early
returns. Two loop flavors:

* `lax.while_loop` (default): exits as soon as every lane is dead — for
  sky-lit scenes most paths die in a few bounces, so this skips the long tail
  of the depth-50 budget. Not reverse-differentiable.
* `lax.scan` with per-bounce `jax.checkpoint` (differentiable=True): fixed
  `max_depth` iterations, rematerializing each bounce in the backward pass so
  the VJP does not store every intermediate wavefront (SURVEY.md §7 step 7).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from raytracer_tpu.core import vecmath as vm
from raytracer_tpu.geometry.intersect import intersect_scene
from raytracer_tpu.geometry.scene import Scene
from raytracer_tpu.materials.materials import UNIFORMS_PER_BOUNCE, shade


class WavefrontState(NamedTuple):
    origin: jnp.ndarray  # (N, 3)
    direction: jnp.ndarray  # (N, 3)
    throughput: jnp.ndarray  # (N, 3)
    radiance: jnp.ndarray  # (N, 3)
    alive: jnp.ndarray  # (N,) bool
    key: jnp.ndarray  # PRNG key
    bounce: jnp.ndarray  # () i32
    segments: jnp.ndarray  # () i32 — ray segments traced this batch (perf metric)


def sky_color(direction):
    """Book-canonical gradient sky: lerp(white, (0.5, 0.7, 1.0)) on unit-y.
    The reference uses only a flat background color (ray.go:53); this is the
    BASELINE.md 'gradient sky' config option."""
    unit = vm.normalize(direction, eps=1e-20)
    a = 0.5 * (unit[..., 1] + 1.0)
    white = jnp.array([1.0, 1.0, 1.0], direction.dtype)
    blue = jnp.array([0.5, 0.7, 1.0], direction.dtype)
    return (1.0 - a)[..., None] * white + a[..., None] * blue


def _bounce_step(scene: Scene, background, sky_gradient: bool, state: WavefrontState):
    """One wavefront bounce: intersect, accumulate emission/background,
    scatter, update masks. Mirrors one level of Ray.GetColor (ray.go:37-53)."""
    key, sub = jax.random.split(state.key)
    hit = intersect_scene(scene, state.origin, state.direction)

    # Miss -> background (ray.go:53). `background` is (3,) flat color unless
    # the static sky_gradient flag selects the book sky.
    if sky_gradient:
        bg = sky_color(state.direction)
    else:
        bg = jnp.broadcast_to(background, state.direction.shape)
    miss = state.alive & ~hit.hit
    radiance = state.radiance + jnp.where(
        miss[..., None], state.throughput * bg, 0.0
    )

    uniforms = jax.random.uniform(
        sub, (state.origin.shape[0], UNIFORMS_PER_BOUNCE), state.origin.dtype
    )
    scat = shade(scene, hit, state.direction, uniforms)

    # Emission adds on every hit (ray.go:41-46).
    live_hit = state.alive & hit.hit
    radiance = radiance + jnp.where(
        live_hit[..., None], state.throughput * scat.emitted, 0.0
    )

    # Continue only where the material scattered (ray.go:44-46; metal absorb
    # materials.go:73-74; lights never scatter materials.go:301-303).
    alive = live_hit & scat.scattered
    throughput = jnp.where(
        alive[..., None], state.throughput * scat.attenuation, state.throughput
    )
    origin = jnp.where(alive[..., None], hit.point, state.origin)
    direction = jnp.where(alive[..., None], scat.direction, state.direction)

    return WavefrontState(
        origin=origin,
        direction=direction,
        throughput=throughput,
        radiance=radiance,
        alive=alive,
        key=key,
        bounce=state.bounce + 1,
        segments=state.segments + jnp.sum(state.alive).astype(state.segments.dtype),
    )


def trace(
    scene: Scene,
    origin,
    direction,
    key,
    background,
    *,
    max_depth: int = 50,
    sky_gradient: bool = False,
    differentiable: bool = False,
    return_stats: bool = False,
):
    """Trace a batch of rays to completion; returns radiance (N, 3)
    (or (radiance, traced_segment_count) with return_stats=True).

    Depth exhaustion contributes black (ray.go:33-35): lanes still alive after
    `max_depth` bounces simply never add their tail.
    """
    n = origin.shape[0]
    dtype = origin.dtype
    init = WavefrontState(
        origin=origin,
        direction=direction,
        throughput=jnp.ones((n, 3), dtype),
        radiance=jnp.zeros((n, 3), dtype),
        alive=jnp.ones((n,), bool),
        key=key,
        bounce=jnp.int32(0),
        segments=jnp.int32(0),
    )
    step = partial(_bounce_step, scene, background, sky_gradient)

    if differentiable:
        # Fixed-depth scan; checkpoint each bounce so the backward pass
        # rematerializes intersections instead of storing every (N,S) buffer.
        def scan_body(state, _):
            return jax.checkpoint(step)(state), None

        final, _ = jax.lax.scan(scan_body, init, None, length=max_depth)
    else:
        final = jax.lax.while_loop(
            lambda s: (s.bounce < max_depth) & jnp.any(s.alive),
            step,
            init,
        )
    if return_stats:
        return final.radiance, final.segments
    return final.radiance
