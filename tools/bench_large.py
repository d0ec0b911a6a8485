"""Large-scene scaling probe: traced Mrays/s at N primitives through the
persistent kernel's cluster-culled path (bench methodology: warm,
median-of-repeats, 400x225 @ 64 spp).

Usage: python tools/bench_large.py [n_prims ...]   (default 10000 20000 50000)
Env: RT_LARGE_SPP (64), RT_LARGE_REPEATS (3), RT_LARGE_SCENE
(rand_spheres_large | quad_field).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass


def main():
    import bench
    from raytracer_tpu.scenes.registry import get_scene

    sizes = [int(a) for a in sys.argv[1:]] or [10000, 20000, 50000]
    spp = int(os.environ.get("RT_LARGE_SPP", "64"))
    repeats = int(os.environ.get("RT_LARGE_REPEATS", "3"))
    scene_name = os.environ.get("RT_LARGE_SCENE", "rand_spheres_large")
    out = {}
    for n in sizes:
        sc, cm, st = get_scene(scene_name, width=400, spp=spp, n_spheres=n)
        from raytracer_tpu.integrator.wavefront import pick_wavefront
        from raytracer_tpu.render.driver import regen_max_slots

        k = regen_max_slots(True, sc.has_noise, sc.num_spheres + sc.num_quads, 0)
        wf = pick_wavefront(st.width * st.height, spp, k, coherent=True)
        try:
            out[str(n)] = bench._measure(
                sc, cm, st, spp=spp, wavefront=wf, repeats=repeats
            )
        except Exception as e:
            out[str(n)] = {"error": str(e)[:300]}
        print(json.dumps({str(n): out[str(n)]}), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
