"""Ablation harness: time the regen while_loop with pieces disabled to see
true in-loop costs (per-dispatch tunnel overhead makes microbenchmarks of
individual ops meaningless — only in-loop deltas are trustworthy)."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")

from raytracer_tpu.core.camera import camera_frame, camera_rays
from raytracer_tpu.geometry.intersect import (
    closest_hit_t_prim, intersect_scene, quad_derived, resolve_hits)
from raytracer_tpu.materials.materials import (
    UNIFORMS_PER_BOUNCE, resolve_and_shade, shade)
from raytracer_tpu.materials.packed import (
    primitive_resolve_table, primitive_shading_table)
from raytracer_tpu.ops import intersect_kernel as ik
from raytracer_tpu.scenes.registry import get_scene


def run(mode: str, n: int = 1 << 19, iters: int = 200):
    scene, cam, settings = get_scene("rand_spheres", spp=16)
    width, height = settings.width, settings.height
    frame_host = None
    packed = primitive_shading_table(scene)
    qd = quad_derived(scene)
    rtable = primitive_resolve_table(scene, qd)
    sph_t = ik.pack_sphere_table(scene.sph_center, scene.sph_radius)
    quad_t = ik.pack_quad_table(qd)
    K = 45
    slot_ids = jax.lax.broadcasted_iota(jnp.int32, (K, 1), 0)

    @jax.jit
    def loop(key):
        frame = camera_frame(cam, width, height)

        def body(state):
            (o, d, tp, rad, act, depth, px, py, sk, log, key, it) = state
            key, k1, k2, k3 = jax.random.split(key, 4)

            if mode != "no_regen":
                grant = ~act
                cam_uni = jax.random.uniform(k1, (n, 4), jnp.float32)
                co, cd = camera_rays(frame, px, py, cam_uni)
                g3 = grant[:, None]
                o = jnp.where(g3, co, o)
                d = jnp.where(g3, cd, d)
                act = act | grant

            if mode == "no_intersect":
                t, prim = jnp.full((n,), 5.0), jnp.zeros((n,), jnp.int32)
            elif mode == "dense_intersect":
                t, prim = closest_hit_t_prim(scene, o, d)
            else:
                t, prim = ik.intersect_pallas(sph_t, quad_t, o, d)

            if mode != "no_shade":
                uni = jax.random.uniform(k2, (n, UNIFORMS_PER_BOUNCE), jnp.float32)
                sc = resolve_and_shade(scene, rtable, t, prim, o, d, uni)
                rad = rad + jnp.where((act & sc.hit)[:, None], tp * sc.emitted, 0.0)
                surv = act & sc.hit & sc.scattered
                tp = jnp.where(surv[:, None], tp * sc.attenuation, tp)
                o = jnp.where(surv[:, None], sc.point, o)
                d = jnp.where(surv[:, None], sc.direction, d)
            else:
                surv = act & jnp.isfinite(t)

            if mode != "no_rr":
                q = jnp.clip(jnp.max(tp, axis=-1), 0.05, 0.95)
                rr = jax.random.uniform(k3, (n,), jnp.float32)
                surv = surv & (rr < q)

            if mode != "no_log":
                fin = act & ~surv
                mask = (slot_ids == sk[None, :]) & fin[None, :]
                log = log + mask[None, :, :] * rad.T[:, None, :]

            act = surv & (depth < 50)
            depth = depth + 1
            return (o, d, tp, rad, act, depth, px, py, sk, log, key, it + 1)

        state = (
            jnp.zeros((n, 3)), jnp.ones((n, 3)), jnp.ones((n, 3)),
            jnp.zeros((n, 3)), jnp.zeros((n,), bool), jnp.zeros((n,), jnp.int32),
            jnp.zeros((n,), jnp.int32), jnp.zeros((n,), jnp.int32),
            jnp.zeros((n,), jnp.int32), jnp.zeros((3, K, n)), key, jnp.int32(0),
        )
        out = jax.lax.while_loop(lambda s: s[-1] < iters, body, state)
        # Consume every carried array so nothing is dead-code-eliminated.
        return sum(jnp.sum(x.astype(jnp.float32)) for x in out[:10])

    r = loop(jax.random.PRNGKey(0))
    float(r)
    t0 = time.perf_counter()
    r = loop(jax.random.PRNGKey(1))
    float(r)
    dt = time.perf_counter() - t0
    print(f"{mode:16s}: {dt / iters * 1e3:.2f} ms/iter  ({n} lanes)", flush=True)


if __name__ == "__main__":
    modes = sys.argv[1:] or [
        "full", "no_shade", "no_regen", "no_rr", "no_log",
        "no_intersect", "dense_intersect",
    ]
    for m in modes:
        run(m)
