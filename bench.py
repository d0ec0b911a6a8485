"""Headline benchmark: traced Mrays/s on the 500-sphere random scene.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Baseline (BASELINE.md): the reference publishes 8m54s for the book's
random-sphere render — ≈0.9M *camera* rays/s lower bound. vs_baseline is our
camera-ray rate over that 0.9 Mrays/s. The headline value is the traced-segment
rate (camera rays + bounce continuations actually processed), the standard
path-tracing throughput metric; the target is ≥100 Mrays/s/chip.

Env knobs: RT_BENCH_SPP (default 64), RT_BENCH_WIDTH (default 400).
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp


def main() -> None:
    from functools import partial

    from raytracer_tpu.core.camera import camera_frame, camera_rays
    from raytracer_tpu.integrator.wavefront import trace
    from raytracer_tpu.render.driver import samples_per_pass_for
    from raytracer_tpu.scenes.registry import get_scene

    spp = int(os.environ.get("RT_BENCH_SPP", "64"))
    width = int(os.environ.get("RT_BENCH_WIDTH", "400"))
    scene, cam, settings = get_scene("rand_spheres", width=width, spp=spp)
    w, h = settings.width, settings.height
    n = w * h
    k = samples_per_pass_for(spp, n)
    passes = spp // k

    @partial(jax.jit, static_argnames=("k",))
    def pass_fn(scene, cam, key, k):
        frame = camera_frame(cam, w, h)
        pix = jax.lax.broadcasted_iota(jnp.int32, (k * n, 1), 0)[:, 0] % n
        kc, kt = jax.random.split(key)
        uni = jax.random.uniform(kc, (k * n, 4), jnp.float32)
        o, d = camera_rays(frame, pix % w, pix // w, uni)
        rad, segs = trace(
            scene, o, d, kt, cam.background,
            max_depth=settings.max_depth, return_stats=True,
        )
        return rad.reshape(k, n, 3).sum(0), segs

    key = jax.random.PRNGKey(0)
    # Warmup / compile.
    img, segs = pass_fn(scene, cam, jax.random.fold_in(key, 999), k)
    jax.block_until_ready(img)

    t0 = time.perf_counter()
    total_segments = 0
    acc = jnp.zeros((n, 3), jnp.float32)
    for p in range(passes):
        out, segs = pass_fn(scene, cam, jax.random.fold_in(key, p), k)
        acc = acc + out
        total_segments += int(segs)
    jax.block_until_ready(acc)
    dt = time.perf_counter() - t0

    camera_rate = n * spp / dt
    traced_rate = total_segments / dt
    print(
        json.dumps(
            {
                "metric": "traced_rays_per_s_randspheres",
                "value": round(traced_rate / 1e6, 3),
                "unit": "Mrays/s",
                "vs_baseline": round(camera_rate / 0.9e6, 2),
                "detail": {
                    "camera_mrays_per_s": round(camera_rate / 1e6, 3),
                    "avg_segments_per_camera_ray": round(total_segments / (n * spp), 2),
                    "size": [w, h],
                    "spp": spp,
                    "wall_s": round(dt, 3),
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
