"""Throughput probe for the large-scene render path (BVH-cluster culled
camera rays + dense-Pallas bounces, render/driver._render_large_scene).

Usage: python scripts/bench_large_scene.py [n_spheres]
Prints warm wall time and traced Mrays/s. The driver switches to this path
above LARGE_SCENE_PRIMS primitives on TPU; see docs/PERF_NOTES.md round 2.
"""

import sys
import time

import numpy as np
import jax

from raytracer_tpu.core.camera import make_camera
from raytracer_tpu.geometry.scene import SceneBuilder
from raytracer_tpu.render.driver import render_image
from raytracer_tpu.utils.metrics import RenderMetrics


def big_scene(n=10000, seed=1):
    rng = np.random.default_rng(seed)
    b = SceneBuilder(0)
    b.add_sphere((0, -1000, 0), 1000, b.lambertian((0.5, 0.5, 0.5)))
    side = int(np.sqrt(n))
    for i in range(side):
        for j in range(side):
            c = (i - side / 2 + 0.9 * rng.random(), 0.2, j - side / 2 + 0.9 * rng.random())
            b.add_sphere(c, 0.2, b.lambertian(tuple(rng.random(3) * rng.random(3))))
    return b.build()


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10000
    scene = big_scene(n)
    cam, settings = make_camera(
        16 / 9, 400, samples_per_pixel=32, max_depth=8,
        look_from=(13, 6, 3), look_at=(0, 0, 0), fov_degrees=40,
        background=(0.7, 0.8, 1.0),
    )
    settings = settings._replace(sky_gradient=True)
    img = render_image(scene, cam, settings, seed=0)  # warm up compile
    _ = float(np.asarray(img).sum())
    m = RenderMetrics(total_spp=32, pixels=400 * 225)
    t0 = time.time()
    img = render_image(scene, cam, settings, seed=1, metrics=m)
    _ = float(np.asarray(img).sum())  # host transfer = reliable sync (tunnel)
    dt = time.time() - t0
    segs = m.traced_segments or 0
    print(f"spheres={scene.num_spheres} warm={dt:.2f}s traced_mrays_per_s={segs / dt / 1e6:.2f}")


if __name__ == "__main__":
    main()
