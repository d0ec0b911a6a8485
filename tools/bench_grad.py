"""Gradient-path measurements (round-3 VERDICT #2 evidence):

* one jitted value_and_grad inverse-render step at configurable size /
  spp / depth, through a chosen backend (scan | tape), with wall time and
  device memory stats;
* defaults reproduce the bench config (200x112@8spp depth 16) and the
  production config (400x225@8spp depth 50).

Usage: python tools/bench_grad.py [scan|tape] [W] [H] [spp] [depth] [prims]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def measure(backend, width, height, spp, max_depth, n_prims=0, repeats=3):
    from raytracer_tpu.diff.grad import render_loss, split_scene
    from raytracer_tpu.diff.tape import render_linear_tape
    from raytracer_tpu.scenes.registry import get_scene

    if n_prims:
        scene, cam, _ = get_scene(
            "rand_spheres_large", width=width, spp=spp, n_spheres=n_prims
        )
    else:
        scene, cam, _ = get_scene("rand_spheres", width=width, spp=spp)
    params, rebuild = split_scene(scene)
    target = jnp.zeros((height, width, 3), jnp.float32)

    if backend == "bucketed":
        from raytracer_tpu.diff.bucketed import make_bucketed_grad_fn

        bstep = make_bucketed_grad_fn(
            rebuild, cam, target, width=width, height=height,
            samples_per_pass=spp, max_depth=max_depth,
        )
        key = jax.random.PRNGKey(7)

        def run_b(k):
            v, g = bstep(params, k)
            return float(v) + float(g["sph_center"].sum())

        run_b(key)
        run_b(jax.random.fold_in(key, 99))
        walls = []
        for r in range(repeats):
            t0 = time.perf_counter()
            run_b(jax.random.fold_in(key, r))
            walls.append(time.perf_counter() - t0)
        dt = statistics.median_low(walls)
        out = {
            "backend": backend,
            "size": [width, height],
            "spp": spp,
            "max_depth": max_depth,
            "n_prims": int(scene.num_spheres + scene.num_quads),
            "step_wall_s": round(dt, 3),
            "camera_mrays_per_s": round(width * height * spp / dt / 1e6, 3),
            "walls_s": [round(x, 3) for x in walls],
        }
        print(json.dumps(out), flush=True)
        return out
    if backend == "tape":
        def loss_fn(params, key):
            img = render_linear_tape(
                rebuild(params), cam, key, width=width, height=height,
                samples_per_pass=spp, max_depth=max_depth,
            )
            return jnp.mean((img - target) ** 2)
    else:
        loss_fn = partial(
            render_loss, rebuild=rebuild, cam=cam, target=target,
            width=width, height=height, samples_per_pass=spp,
            max_depth=max_depth,
        )
    step = jax.jit(jax.value_and_grad(loss_fn))
    key = jax.random.PRNGKey(7)

    def run(k):
        v, g = step(params, key=k) if backend != "tape" else step(params, k)
        return float(v) + float(g["sph_center"].sum())

    run(key)
    run(jax.random.fold_in(key, 99))
    walls = []
    for r in range(repeats):
        t0 = time.perf_counter()
        run(jax.random.fold_in(key, r))
        walls.append(time.perf_counter() - t0)
    dt = statistics.median_low(walls)
    mem = {}
    try:
        st = jax.devices()[0].memory_stats() or {}
        mem = {
            "peak_bytes_in_use_mb": round(
                st.get("peak_bytes_in_use", 0) / 2**20, 1
            ),
            "bytes_in_use_mb": round(st.get("bytes_in_use", 0) / 2**20, 1),
        }
    except Exception:
        pass
    out = {
        "backend": backend,
        "size": [width, height],
        "spp": spp,
        "max_depth": max_depth,
        "n_prims": int(scene.num_spheres + scene.num_quads),
        "step_wall_s": round(dt, 3),
        "camera_mrays_per_s": round(width * height * spp / dt / 1e6, 3),
        "walls_s": [round(x, 3) for x in walls],
        **mem,
    }
    print(json.dumps(out), flush=True)
    return out


if __name__ == "__main__":
    a = sys.argv[1:]
    backend = a[0] if a else "scan"
    w = int(a[1]) if len(a) > 1 else 200
    h = int(a[2]) if len(a) > 2 else 112
    spp = int(a[3]) if len(a) > 3 else 8
    depth = int(a[4]) if len(a) > 4 else 16
    prims = int(a[5]) if len(a) > 5 else 0
    measure(backend, w, h, spp, depth, prims)
