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

# Persistent compile cache: repeated heavy remote compiles destabilize the
# TPU tunnel in this environment; the cache makes reruns cheap.
try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass


def main() -> None:
    from raytracer_tpu.render.driver import render_regen
    from raytracer_tpu.scenes.registry import get_scene

    spp = int(os.environ.get("RT_BENCH_SPP", "64"))
    width = int(os.environ.get("RT_BENCH_WIDTH", "400"))
    wavefront = int(os.environ.get("RT_BENCH_WAVEFRONT", str(1 << 19)))
    scene, cam, settings = get_scene("rand_spheres", width=width, spp=spp)
    w, h = settings.width, settings.height
    n = w * h

    kw = dict(
        width=w,
        height=h,
        spp=spp,
        wavefront_size=wavefront,
        max_depth=settings.max_depth,
        sky_gradient=False,
        use_pallas=os.environ.get("RT_BENCH_PALLAS", "1") == "1",
        use_megakernel=os.environ.get("RT_BENCH_MEGAKERNEL", "1") == "1",
        return_stats=True,
    )
    key = jax.random.PRNGKey(0)
    # Warmup / compile.
    img, segs, iters = render_regen(scene, cam, jax.random.fold_in(key, 999), **kw)
    # NOTE: block_until_ready does not reliably block through the axon TPU
    # tunnel; a host transfer is the only dependable sync point.
    float(img.sum())

    t0 = time.perf_counter()
    img, segs, iters = render_regen(scene, cam, key, **kw)
    float(img.sum())
    dt = time.perf_counter() - t0
    total_segments = int(segs)

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
                    "wavefront_iters": int(iters),
                    "occupancy": round(total_segments / (int(iters) * wavefront), 3),
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
