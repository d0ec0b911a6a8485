"""Command-line driver: render a registered scene to PPM/PNG.

Replacement for the reference's main() (main.go:22-78) with real flags
instead of compile-time constants, plus structured progress and a rays/s
report (SURVEY.md §5 observability).

Usage:
    python -m raytracer_tpu.cli --scene cornell --out out/cornell.png
"""

from __future__ import annotations

import argparse
import json
import time

import jax

# Persistent compile cache: repeated heavy remote compiles destabilize the
# TPU tunnel in this environment; the cache makes reruns cheap.
try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

from raytracer_tpu.render.driver import render_scene
from raytracer_tpu.scenes.registry import SCENES, get_scene
from raytracer_tpu.imgio.image import write_png, write_ppm


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--scene", default="rand_spheres", choices=sorted(SCENES))
    ap.add_argument("--out", default="out/img.png")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--width", type=int, default=None)
    ap.add_argument("--spp", type=int, default=None)
    ap.add_argument("--max-depth", type=int, default=None)
    ap.add_argument("--profile", action="store_true", help="jax.profiler trace to out/trace")
    ap.add_argument(
        "--memory-profile",
        default=None,
        metavar="PATH",
        help="write a JSON device-memory report (live buffers by shape) "
        "after the render — heap-profile analog of the reference's "
        "main.go:70-73 (pprof capture aborts under the PJRT tunnel)",
    )
    ap.add_argument(
        "--checkpoint",
        default=None,
        help="checkpoint file; resumes from it if present (fail-stop + rerun)",
    )
    ap.add_argument(
        "--shard",
        action="store_true",
        help="render over ALL visible devices ((tiles, samples) mesh via "
        "shard_map; see parallel/shard.py) — for multi-chip hosts",
    )
    ap.add_argument(
        "--sample-parallel",
        type=int,
        default=1,
        help="with --shard: devices cooperating on the same pixels "
        "(must divide the device count)",
    )
    ap.add_argument(
        "--bilinear",
        action="store_true",
        help="bilinear texture filtering (scenes with image textures; the "
        "reference is nearest-neighbor, materials.go:184-192). On the TPU "
        "persistent path this filters stochastically — one tap sampled "
        "with its bilinear weight, unbiased (ops/persistent_kernel.py)",
    )
    ap.add_argument(
        "--bilinear-exact",
        action="store_true",
        help="with --bilinear: force the deterministic 4-tap filter (exact "
        "parity with the XLA reference path) instead of the production "
        "stochastic single tap (advisor r4: the parity mode must stay "
        "reachable)",
    )
    ap.add_argument(
        "--no-bucket",
        action="store_true",
        help="disable scene-table size bucketing (bucketing lets scenes with "
        "nearby table sizes share one jit executable; the image is "
        "bit-identical either way — see geometry.scene.bucket_size)",
    )
    args = ap.parse_args(argv)
    if args.sample_parallel != 1 and not args.shard:
        ap.error("--sample-parallel requires --shard")

    overrides = {"bucket": not args.no_bucket}
    if args.bilinear:
        import inspect

        if "bilinear" not in inspect.signature(SCENES[args.scene]).parameters:
            ap.error(f"--bilinear is not supported by scene {args.scene!r}")
        overrides["bilinear"] = True
    if args.width is not None:
        overrides["width"] = args.width
    if args.spp is not None:
        overrides["spp"] = args.spp
    if args.max_depth is not None:
        overrides["max_depth"] = args.max_depth

    scene, cam, settings = get_scene(args.scene, args.seed, **overrides)

    from raytracer_tpu.utils.metrics import (
        RenderMetrics,
        device_memory_stats,
        profiler_trace,
        save_memory_profile,
    )

    metrics = RenderMetrics(
        total_spp=settings.samples_per_pixel,
        pixels=settings.width * settings.height,
    )
    t0 = time.perf_counter()
    with profiler_trace("out/trace" if args.profile else None):
        if args.checkpoint and not args.shard:
            import numpy as np
            import jax as _jax

            from raytracer_tpu.render.checkpoint import render_with_checkpoints
            from raytracer_tpu.render.postprocess import to_u8

            linear = render_with_checkpoints(
                scene,
                cam,
                settings,
                seed=args.seed,
                checkpoint_path=args.checkpoint,
                progress=True,
            )
            img = np.asarray(_jax.device_get(to_u8(linear)))
        elif args.shard:
            import numpy as np

            from raytracer_tpu.parallel.mesh import make_mesh
            from raytracer_tpu.parallel.shard import render_image_sharded
            from raytracer_tpu.render.postprocess import to_u8

            mesh = make_mesh(sample_parallel=args.sample_parallel)
            linear = render_image_sharded(
                scene, cam, settings, mesh, seed=args.seed,
                progress=True, metrics=metrics,
                checkpoint_path=args.checkpoint,
                bilinear_stochastic=False if args.bilinear_exact else None,
            )
            img = np.asarray(jax.device_get(to_u8(linear)))
        else:
            img = render_scene(
                scene, cam, settings, seed=args.seed, progress=True,
                metrics=metrics,
                bilinear_stochastic=False if args.bilinear_exact else None,
            )
    dt = time.perf_counter() - t0

    if args.out.endswith(".ppm"):
        write_ppm(args.out, img)
    else:
        write_png(args.out, img)

    if args.memory_profile:
        if not save_memory_profile(args.memory_profile):
            print("memory profile unavailable on this backend", flush=True)

    camera_rays = settings.width * settings.height * settings.samples_per_pixel
    report = {
        "scene": args.scene,
        "size": [settings.width, settings.height],
        "spp": settings.samples_per_pixel,
        "wall_s": round(dt, 3),
        "camera_mrays_per_s": round(camera_rays / dt / 1e6, 3),
        "out": args.out,
    }
    snap = metrics.snapshot()
    for k in ("traced_mrays_per_s", "wavefront_iters", "occupancy", "retirement_log_mb"):
        if k in snap:
            report[k] = snap[k]
    report.update(device_memory_stats())
    print(json.dumps(report))


if __name__ == "__main__":
    main()
