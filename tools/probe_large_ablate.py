"""In-kernel cost split for the LARGE-scene persistent path: time the
whole-loop kernel at N primitives with pieces constant-folded via the
ablate hook ("resolve" = winner-row resolve scan, "retire" = retirement
log adds). Only in-loop deltas are trustworthy through the tunnel.

Usage: python tools/probe_large_ablate.py [n_prims] [spp]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tpu")

from raytracer_tpu.core.camera import camera_frame
from raytracer_tpu.geometry.intersect import quad_derived
from raytracer_tpu.integrator.wavefront import (
    pick_wavefront,
    regen_jump,
    schedule_arrays,
    strided_schedule,
)
from raytracer_tpu.ops.persistent_kernel import (
    pack_camera_scalars_bg,
    pack_persistent_tables,
    render_persistent_pallas,
)
from raytracer_tpu.render.driver import cluster_for_render, regen_max_slots
from raytracer_tpu.scenes.registry import get_scene


def main():
    n_prims = int(sys.argv[1]) if len(sys.argv) > 1 else 10000
    spp = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    rows = int(os.environ.get("RT_PROBE_ROWS", "64"))
    scene, cam, st = get_scene(
        "rand_spheres_large", width=400, spp=spp, n_spheres=n_prims
    )
    w, h = st.width, st.height
    scene, cs = cluster_for_render(scene, cam)
    frame = camera_frame(cam, w, h)
    qd = quad_derived(scene)
    sph_t, quad_t, res_t = pack_persistent_tables(scene, qd)
    cam_sc = pack_camera_scalars_bg(frame, cam.background)
    n_pix = w * h
    slots = regen_max_slots(True, scene.has_noise, n_prims, 0, rows=rows)
    wf = pick_wavefront(n_pix, spp, slots, coherent=True)
    n, num_slots, _ = strided_schedule(n_pix, spp, wf)
    rem0, px0, py0 = schedule_arrays(n, n_pix, spp, w)
    jump = regen_jump(n, n_pix)
    print(
        f"n_prims={n_prims} wavefront={n} slots={num_slots} rows={rows} "
        f"sclusters={cs.sph.shape[0]} ssuper={cs.sph_super.shape[0]}",
        flush=True,
    )

    def run(ablate, cluster):
        kw = dict(
            width=w, height=h, jump_px=jump % w, jump_py=jump // w,
            num_slots=num_slots, rows=rows, max_depth=st.max_depth,
            rr_hi=0.75, sky_gradient=st.sky_gradient, ablate=ablate,
        )
        args = (
            sph_t, quad_t, res_t, cam_sc, jnp.int32(7),
            rem0.astype(jnp.int32), px0, py0, None,
            cs if cluster else None,
        )
        log, segs, iters, clent = render_persistent_pallas(*args, **kw)
        float(log.sum())  # tunnel-reliable sync
        t0 = time.perf_counter()
        log, segs, iters, clent = render_persistent_pallas(*args, **kw)
        s = float(log.sum())
        dt = time.perf_counter() - t0
        print(
            f"ablate={ablate or 'none':16s} cluster={int(cluster)} "
            f"wall={dt:.3f}s segs={int(segs)} iters={int(iters)} "
            f"clent={int(clent)} occ={int(segs)/(int(iters)*rows*128):.3f} "
            f"mrays={int(segs)/dt/1e6:.1f}",
            flush=True,
        )

    # ';'-separated ablate modes; "none" = the production kernel.
    modes = os.environ.get("RT_PROBE_ABLATE", "none;resolve;retire").split(";")
    for ablate in modes:
        run("" if ablate == "none" else ablate, True)


if __name__ == "__main__":
    main()
