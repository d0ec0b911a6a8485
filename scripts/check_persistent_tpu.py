"""TPU self-check: the persistent megakernel is the SAME estimator as the
oracle-validated XLA wavefront.

The interpreter stubs the hardware PRNG (tests/test_persistent_kernel.py
covers exact invariants there), so the distributional comparison needs a
real chip: render each persistent-supported reference scene through BOTH
backends with independent RNG and require the Monte-Carlo statistics to
agree within sampling error. Prints one JSON line; exit code 0 iff all
scenes pass.

    python scripts/check_persistent_tpu.py [spp]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from raytracer_tpu.render.driver import render_regen
from raytracer_tpu.scenes.registry import get_scene

# (label, scene, fast-path flags). earth now runs the persistent kernel
# (in-kernel packed-RGB image path); the megakernel front-half remains the
# fallback for over-budget/multi-image scenes and uses the in-kernel hardware
# PRNG too (stubbed in the interpreter), so both surfaces get the on-device
# check.
SCENES = (
    ("rand_spheres", "rand_spheres", dict(use_pallas=True, use_persistent=True)),
    ("perlin", "perlin", dict(use_pallas=True, use_persistent=True)),
    ("quads", "quads", dict(use_pallas=True, use_persistent=True)),
    ("simple_light", "simple_light", dict(use_pallas=True, use_persistent=True)),
    ("cornell", "cornell", dict(use_pallas=True, use_persistent=True)),
    ("earth", "earth", dict(use_pallas=True, use_persistent=True)),
    ("earth_megakernel", "earth", dict(use_pallas=True, use_megakernel=True)),
)

# Scene-builder kwargs per scene name. earth_bilinear exercises the round-3
# deterministic in-kernel 4-tap fetch; earth_bilinear_stochastic is the
# round-4 PRODUCTION filter (one tap sampled with its bilinear weight —
# unbiased, so its Monte-Carlo statistics must match the XLA deterministic
# bilinear within sampling error; this is the E[tap]=bilinear check that
# interpret mode cannot do with a stubbed PRNG).
SCENES = SCENES + (
    ("earth_bilinear", "earth", dict(use_pallas=True, use_persistent=True)),
    (
        "earth_bilinear_stochastic",
        "earth",
        dict(use_pallas=True, use_persistent=True, bilinear_stochastic=True),
    ),
)
BUILD_KW = {
    "earth_bilinear": dict(bilinear=True),
    "earth_bilinear_stochastic": dict(bilinear=True),
}


def check_sample_counter() -> dict:
    """Exact per-pixel sample accounting at wavefront < n_pixels — the regime
    where XLA:TPU miscompiled the retirement-log fold fusion (round 3; see
    the optimization_barrier note in wavefront._fold_log). With a white
    background and no geometry, fb/spp must be exactly 1.0 everywhere; the
    miscompile put spp+1 samples on the first K*n - total pixels, and other
    shapes in this regime aborted with opaque INTERNAL launch errors."""
    from raytracer_tpu.core.camera import make_camera
    from raytracer_tpu.geometry.scene import SceneBuilder

    w = h = 600
    spp, wf = 16, 294912  # wf < 360000 pixels; K*n - total = 138240 overhang
    scene = SceneBuilder(0).build()
    cam, _ = make_camera(1.0, w, samples_per_pixel=spp, background=(1, 1, 1))
    img = render_regen(
        scene, cam, jax.random.PRNGKey(0), spp=spp, height=h, width=w,
        wavefront_size=wf, max_depth=8, sky_gradient=False,
        use_pallas=True, use_persistent=True, rr_max_q=0.75,
    )
    a = np.asarray(img)[..., 0]
    bad = int((a != 1.0).sum())
    return {"ok": bad == 0, "bad_pixels": bad,
            "minmax": [float(a.min()), float(a.max())]}


def check_large_scene_clustered(spp: int = 32) -> dict:
    """The two-level cluster-culled persistent path vs the independent
    megakernel wavefront (ik.intersect_pallas dense SMEM loop) on a 10K
    sphere grid, on real hardware, statistically. (Bit-identity of
    clustered vs dense persistent loops is pinned in interpret mode —
    tests/test_persistent_kernel.py; this adds an on-chip cross-check
    against a different estimator implementation entirely.)"""
    from raytracer_tpu.render.driver import cluster_for_render
    from raytracer_tpu.scenes.registry import get_scene

    scene, cam, settings = get_scene(
        "rand_spheres_large", width=200, spp=spp, n_spheres=10000
    )
    w, h = settings.width, settings.height
    kw = dict(
        width=w, height=h, spp=spp, wavefront_size=1 << 18,
        max_depth=settings.max_depth, sky_gradient=settings.sky_gradient,
        rr_max_q=0.75,
    )
    scene_cl, cl = cluster_for_render(scene, cam)
    a = np.asarray(
        render_regen(
            scene_cl, cam, jax.random.PRNGKey(11), **kw,
            use_pallas=True, use_persistent=True, cluster_table=cl,
        )
    )
    b = np.asarray(
        render_regen(
            scene, cam, jax.random.PRNGKey(12), **kw,
            use_pallas=True, use_megakernel=True,
        )
    )
    mean_a, mean_b = a.mean((0, 1)), b.mean((0, 1))
    ok = bool(
        np.allclose(mean_a, mean_b, rtol=0.02, atol=0.004)
        and abs(float(a.std()) - float(b.std())) < 0.05 * max(float(b.std()), 0.1)
    )
    return {
        "ok": ok,
        "mean_clustered": [round(float(x), 4) for x in mean_a],
        "mean_megakernel": [round(float(x), 4) for x in mean_b],
        "std": [round(float(a.std()), 4), round(float(b.std()), 4)],
    }


def main() -> int:
    spp = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    results, ok_all = {}, True
    results["sample_counter_small_wavefront"] = check_sample_counter()
    ok_all &= results["sample_counter_small_wavefront"]["ok"]
    results["large_10k_clustered_vs_megakernel"] = check_large_scene_clustered()
    ok_all &= results["large_10k_clustered_vs_megakernel"]["ok"]
    for name, scene_name, fast_flags in SCENES:
        scene, cam, settings = get_scene(
            scene_name, width=200, spp=spp, **BUILD_KW.get(name, {})
        )
        w, h = settings.width, settings.height
        kw = dict(
            width=w, height=h, spp=spp,
            wavefront_size=int(min(max(-(-(w * h * spp) // 64), 1 << 16), 1 << 21)),
            max_depth=settings.max_depth, sky_gradient=settings.sky_gradient,
            rr_max_q=0.75,
        )
        imgs = {}
        for mode, flags in (("fast", fast_flags), ("xla", dict(use_pallas=False))):
            img = render_regen(
                scene, cam, jax.random.PRNGKey(11), **kw, **flags
            )
            imgs[mode] = np.asarray(img)
        a, b = imgs["fast"], imgs["xla"]
        # Per-pixel MC standard error bounds the allowed mean/std drift.
        mean_a, mean_b = a.mean((0, 1)), b.mean((0, 1))
        ok = bool(
            np.allclose(mean_a, mean_b, rtol=0.02, atol=0.004)
            and abs(float(a.std()) - float(b.std())) < 0.05 * max(float(b.std()), 0.1)
        )
        ok_all &= ok
        results[name] = {
            "ok": ok,
            "mean_fast": [round(float(x), 4) for x in mean_a],
            "mean_xla": [round(float(x), 4) for x in mean_b],
            "std": [round(float(a.std()), 4), round(float(b.std()), 4)],
        }
    print(json.dumps({"ok": ok_all, "spp": spp, "scenes": results}))
    return 0 if ok_all else 1


if __name__ == "__main__":
    sys.exit(main())
