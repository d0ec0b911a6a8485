"""Throughput probe for the large-scene render path (BVH-cluster culled
camera rays + dense-Pallas bounces, render/driver._render_large_scene).

Usage: python scripts/bench_large_scene.py [n_spheres]
Prints warm wall time and traced Mrays/s. The driver switches to this path
above LARGE_SCENE_PRIMS primitives on TPU; see docs/PERF_NOTES.md round 2.
"""

import sys
import time

import numpy as np

from raytracer_tpu.render.driver import render_image
from raytracer_tpu.scenes.registry import get_scene
from raytracer_tpu.utils.metrics import RenderMetrics


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10000
    scene, cam, settings = get_scene("rand_spheres_large", n_spheres=n)
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
