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
from raytracer_tpu.materials.packed import primitive_shading_table


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


def _bounce_step(
    scene: Scene, packed, background, sky_gradient: bool, state: WavefrontState
):
    """One wavefront bounce: intersect, accumulate emission/background,
    scatter, update masks. Mirrors one level of Ray.GetColor (ray.go:37-53).
    `packed` is the loop-invariant primitive shading table."""
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
    scat = shade(scene, hit, state.direction, uniforms, packed=packed)

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
    # Build the packed shading table once; it is loop-invariant.
    packed = primitive_shading_table(scene)
    step = partial(_bounce_step, scene, packed, background, sky_gradient)

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


class RegenState(NamedTuple):
    """Carry for the regenerative wavefront loop."""

    origin: jnp.ndarray  # (N, 3)
    direction: jnp.ndarray  # (N, 3)
    throughput: jnp.ndarray  # (N, 3)
    radiance: jnp.ndarray  # (N, 3) — current path's accumulated radiance
    active: jnp.ndarray  # (N,) bool — lane has a path in flight
    depth: jnp.ndarray  # (N,) i32 — current path's bounce count
    pixel: jnp.ndarray  # (N,) i32 — current path's pixel id
    fb: jnp.ndarray  # (n_pixels, 3) framebuffer of radiance sums
    next_sample: jnp.ndarray  # () i32 — samples started so far
    key: jnp.ndarray
    segments: jnp.ndarray  # () i32 — total segments traced (perf metric)
    iters: jnp.ndarray  # () i32 — loop iterations (occupancy metric)


def render_wavefront_regen(
    scene: Scene,
    frame,
    background,
    *,
    width: int,
    height: int,
    spp: int,
    wavefront_size: int,
    key,
    max_depth: int = 50,
    sky_gradient: bool = False,
    russian_roulette: bool = True,
    rr_start_depth: int = 8,
    return_stats: bool = False,
):
    """Render with *path regeneration*: a fixed-size wavefront where a lane
    whose path terminates immediately starts the next camera sample, keeping
    occupancy near 100%.

    russian_roulette: after `rr_start_depth` bounces, paths survive with
    probability q = clamp(max(throughput), 0.05, 0.95) and are reweighted by
    1/q — an *unbiased* tail trim (the expectation equals the reference's
    depth-capped estimator exactly; only variance changes). Mostly matters
    for dielectric paths whose throughput never attenuates (materials.go:111
    attenuation = (1,1,1)) and would otherwise ride out all 50 bounces.

    Why: the plain batched loop runs until the LAST path dies — at depth 50
    with ~2.9 average segments per path that is ~6% average occupancy
    (measured). Regeneration is the standard wavefront-path-tracing fix
    (SURVEY.md §5 "long-context analog"): total iterations collapse from
    max_depth to ≈ total_segments / wavefront_size + a straggler tail.

    The per-lane camera sampling and bounce math are identical to
    trace()/render_pass, so images agree in distribution (same estimator).

    Returns the (height*width, 3) framebuffer of radiance *sums* over spp
    samples per pixel (divide by spp for the mean); with return_stats also
    (segments, iterations).
    """
    from raytracer_tpu.core.camera import camera_rays  # local: avoid cycle

    n_pixels = width * height
    total_samples = n_pixels * spp
    n = wavefront_size
    dtype = jnp.float32
    packed = primitive_shading_table(scene)

    def body(s: RegenState) -> RegenState:
        key, k_regen, k_bounce, k_rr = jax.random.split(s.key, 4)

        # ---- regeneration phase: idle lanes claim the next sample ids ----
        want = ~s.active
        rank = jnp.cumsum(want.astype(jnp.int32)) - 1
        sample_id = s.next_sample + rank
        grant = want & (sample_id < total_samples)
        # Sample-major interleave: consecutive ids sweep the image, so lanes
        # regenerated together trace coherent pixels.
        new_pixel = sample_id % n_pixels
        pixel = jnp.where(grant, new_pixel, s.pixel)
        cam_uni = jax.random.uniform(k_regen, (n, 4), dtype)
        cam_o, cam_d = camera_rays(
            frame, pixel % width, pixel // width, cam_uni
        )
        g3 = grant[:, None]
        origin = jnp.where(g3, cam_o, s.origin)
        direction = jnp.where(g3, cam_d, s.direction)
        throughput = jnp.where(g3, 1.0, s.throughput)
        radiance = jnp.where(g3, 0.0, s.radiance)
        depth = jnp.where(grant, 0, s.depth)
        active = s.active | grant
        next_sample = s.next_sample + jnp.sum(grant.astype(jnp.int32))

        # ---- one bounce (identical math to _bounce_step) ----
        hit = intersect_scene(scene, origin, direction)
        if sky_gradient:
            bg = sky_color(direction)
        else:
            bg = jnp.broadcast_to(background, direction.shape)
        miss = active & ~hit.hit
        radiance = radiance + jnp.where(miss[:, None], throughput * bg, 0.0)
        uniforms = jax.random.uniform(k_bounce, (n, UNIFORMS_PER_BOUNCE), dtype)
        scat = shade(scene, hit, direction, uniforms, packed=packed)
        live_hit = active & hit.hit
        radiance = radiance + jnp.where(
            live_hit[:, None], throughput * scat.emitted, 0.0
        )
        survives = live_hit & scat.scattered
        depth = depth + active.astype(jnp.int32)
        survives = survives & (depth < max_depth)  # depth budget (ray.go:33-35)
        throughput = jnp.where(
            survives[:, None], throughput * scat.attenuation, throughput
        )
        if russian_roulette:
            q = jnp.clip(jnp.max(throughput, axis=-1), 0.05, 0.95)
            rr_uni = jax.random.uniform(k_rr, (n,), dtype)
            rr_on = survives & (depth >= rr_start_depth)
            survives = survives & (~rr_on | (rr_uni < q))
            throughput = jnp.where(
                (rr_on & survives)[:, None], throughput / q[:, None], throughput
            )
        origin = jnp.where(survives[:, None], hit.point, origin)
        direction = jnp.where(survives[:, None], scat.direction, direction)

        # ---- retire finished paths into the framebuffer ----
        finished = active & ~survives
        fb = s.fb.at[pixel].add(
            jnp.where(finished[:, None], radiance, 0.0), mode="drop"
        )
        return RegenState(
            origin=origin,
            direction=direction,
            throughput=throughput,
            radiance=radiance,
            active=survives,
            depth=depth,
            pixel=pixel,
            fb=fb,
            next_sample=next_sample,
            key=key,
            segments=s.segments + jnp.sum(active.astype(jnp.int32)),
            iters=s.iters + 1,
        )

    init = RegenState(
        origin=jnp.zeros((n, 3), dtype),
        direction=jnp.ones((n, 3), dtype),
        throughput=jnp.ones((n, 3), dtype),
        radiance=jnp.zeros((n, 3), dtype),
        active=jnp.zeros((n,), bool),
        depth=jnp.zeros((n,), jnp.int32),
        pixel=jnp.zeros((n,), jnp.int32),
        fb=jnp.zeros((n_pixels, 3), dtype),
        next_sample=jnp.int32(0),
        key=key,
        segments=jnp.int32(0),
        iters=jnp.int32(0),
    )
    final = jax.lax.while_loop(
        lambda s: (s.next_sample < total_samples) | jnp.any(s.active),
        body,
        init,
    )
    if return_stats:
        return final.fb, final.segments, final.iters
    return final.fb
