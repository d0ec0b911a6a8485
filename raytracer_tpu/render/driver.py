"""Tiled/batched render driver: the TPU replacement for the reference's
goroutine worker pool + ordered channel pipeline (camera.go:180-263).

Design (SURVEY.md §2.1 "Render engine"): the image is a flat pixel array;
each jitted *pass* traces `samples_per_pass` fresh camera samples for every
pixel in one big wavefront batch (pixel index is just an array index, so the
reference's ordering machinery — Bridge/Agg/Buf stages — has no analog).
Passes accumulate radiance on device; spp is exact. One compiled executable
serves all passes (the PRNG key is the only changing input).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from raytracer_tpu.core.camera import Camera, RenderSettings, camera_frame, camera_rays
from raytracer_tpu.geometry.scene import Scene
from raytracer_tpu.integrator.wavefront import render_wavefront_regen, trace
from raytracer_tpu.render.postprocess import to_u8

# Target wavefront size per pass: 512K trades per-iteration efficiency
# against regeneration occupancy (measured best on v5e).
DEFAULT_TARGET_RAYS_PER_PASS = 1 << 19

# Above this primitive count the persistent kernel switches its sphere loop
# to in-kernel cluster culling (geometry.bvh.cluster_scene + tile-uniform
# lax.cond skips — the BVH-traversal analog of bvh.go:220-249): the dense
# loop is linear in scene size, culling is ~linear in clusters *touched*.
# Crossover measured on v5e sphere grids at 400x225@16spp: 1K prims dense
# 22.6 vs clustered 19.9 Mrays/s, 2K 17.3 vs 18.4, 4K 10.9 vs 17.8
# (docs/PERF_NOTES.md round 3).
CLUSTERED_SCENE_PRIMS = 1536

# Above this primitive count scenes the persistent kernel cannot serve
# (unsupported textures) fall back to per-pass rendering with the culled
# camera intersector + dense-Pallas bounces (docs/PERF_NOTES.md round 2).
LARGE_SCENE_PRIMS = 4096


def regen_max_slots(
    use_persistent: bool,
    has_noise: bool,
    n_prims: int = 0,
    img_texels: int = 0,
    rows: int = 0,
) -> int:
    """Retirement-log slot budget per chunk of the regenerative wavefront.

    The persistent kernel holds everything in the 16 MB VMEM: the
    double-buffered (3*K*rows, 128) retirement-log block (~0.19 MB per
    slot), the resolve table (N_RES * ceil(P/128) rows), the packed image
    table, 18 (64, 128) state scratch buffers, and — on noise scenes —
    ~6 MB of in-kernel Perlin stack temporaries. Solve for K under that
    budget (validated against measured ceilings: 64 fits plain scenes, 40
    noise scenes, and K=45 missed by 64 KB at grid 124 in round 2 — the
    2 MB slack term absorbs the compiler's revolving buffers). `rows` is
    the kernel tile height (the `persistent_rows` knob; 0 -> DEFAULT_ROWS)
    — both the state scratch and the per-slot log term scale with it. The
    megakernel/XLA paths keep the log in HBM and always afford 64."""
    if not use_persistent:
        return 64
    from raytracer_tpu.ops.persistent_kernel import DEFAULT_ROWS, N_RES

    rows = rows or DEFAULT_ROWS
    budget = 16 << 20
    fixed = 18 * (rows * 128 * 4)  # wavefront state scratch
    fixed += 2 * N_RES * (-(-max(n_prims, 128) // 128)) * 512  # resolve table
    fixed += 2 * (-(-img_texels // 128)) * 512  # packed image table
    if has_noise:
        # In-kernel Perlin stack temporaries; constant back-solved from the
        # measured K=40 ceiling on noise scenes (round 2). Stack temporaries
        # are per-element, so they scale with the tile height too.
        fixed += int(5.8 * (1 << 20)) * rows // DEFAULT_ROWS
    slack = 2 << 20
    per_slot = 2 * 3 * rows * 128 * 4
    k = (budget - fixed - slack) // per_slot
    return int(max(4, min(40 if has_noise else 64, k)))


def regen_spp_chunk(
    spp: int, n_pixels: int, wavefront: int, max_slots: int, n_dev: int = 1
) -> int:
    """Chunk the spp budget so each device's retirement-log slot count stays
    within `max_slots` (a device's share of a chunk is ceil(chunk / n_dev),
    so bound that ceil: chunk <= n_dev * floor(max_slots * wavefront / n)).
    Prefers a divisor of spp: every chunk is then the same size -> exactly
    ONE compiled executable (a second chunk size costs a ~minute-scale
    remote compile on this tunnel). Shared by render_image and the sharded
    renderer so the two sizing rules cannot drift."""
    cap = max(1, min(spp, n_dev * ((max_slots * wavefront) // max(1, n_pixels))))
    return next((k for k in range(cap, 0, -1) if spp % k == 0), cap)


def samples_per_pass_for(
    spp: int, num_pixels: int, target_rays: int = DEFAULT_TARGET_RAYS_PER_PASS
) -> int:
    """Largest k <= ideal that divides spp, so passes * k == spp exactly."""
    ideal = max(1, min(spp, target_rays // max(1, num_pixels)))
    for k in range(ideal, 0, -1):
        if spp % k == 0:
            return k
    return 1


@partial(
    jax.jit,
    static_argnames=("width", "height", "samples_per_pass", "max_depth", "sky_gradient"),
)
def render_pass(
    scene: Scene,
    cam: Camera,
    key,
    *,
    width: int,
    height: int,
    samples_per_pass: int,
    max_depth: int,
    sky_gradient: bool,
):
    """Trace `samples_per_pass` samples for every pixel; return the per-pixel
    radiance *sum* of this pass, shape (height, width, 3)."""
    n = width * height
    k = samples_per_pass
    frame = camera_frame(cam, width, height)

    pix = jax.lax.broadcasted_iota(jnp.int32, (k * n, 1), 0)[:, 0] % n
    px = pix % width
    py = pix // width

    key_cam, key_trace = jax.random.split(key)
    cam_uniforms = jax.random.uniform(key_cam, (k * n, 4), jnp.float32)
    origin, direction = camera_rays(frame, px, py, cam_uniforms)

    radiance = trace(
        scene,
        origin,
        direction,
        key_trace,
        cam.background,
        max_depth=max_depth,
        sky_gradient=sky_gradient,
    )
    per_pixel = radiance.reshape(k, n, 3).sum(axis=0)
    return per_pixel.reshape(height, width, 3)


@partial(
    jax.jit,
    static_argnames=(
        "width",
        "height",
        "spp",
        "wavefront_size",
        "max_depth",
        "sky_gradient",
        "use_pallas",
        "use_megakernel",
        "use_persistent",
        "persistent_rows",
        "rr_max_q",
        "bilinear_stochastic",
        "return_stats",
    ),
)
def _render_regen_fb(
    scene: Scene,
    cam: Camera,
    key,
    *,
    width: int,
    height: int,
    spp: int,
    wavefront_size: int,
    max_depth: int,
    sky_gradient: bool,
    use_pallas: bool = False,
    use_megakernel: bool = False,
    use_persistent: bool = False,
    persistent_rows: int = 0,
    rr_max_q: float = 0.95,
    cluster_table=None,
    bilinear_stochastic: bool = False,
    return_stats: bool = False,
):
    frame = camera_frame(cam, width, height)
    return render_wavefront_regen(
        scene,
        frame,
        cam.background,
        width=width,
        height=height,
        spp=spp,
        wavefront_size=wavefront_size,
        key=key,
        max_depth=max_depth,
        sky_gradient=sky_gradient,
        use_pallas=use_pallas,
        use_megakernel=use_megakernel,
        use_persistent=use_persistent,
        persistent_rows=persistent_rows,
        rr_max_q=rr_max_q,
        cluster_table=cluster_table,
        bilinear_stochastic=bilinear_stochastic,
        return_stats=return_stats,
    )


def render_regen(scene, cam, key, *, spp, height, width, return_stats=False, **kw):
    """Full-image render via the regenerative wavefront (the production fast
    path): one jit call traces the entire sample budget at ~full occupancy.
    Returns mean radiance (H, W, 3) (+ (segments, iters) with stats).

    The reshape/divide epilogue deliberately lives OUTSIDE the big jit: fused
    into the wavefront program it reproducibly crashes the remote TPU
    compile service at large image sizes (observed at 1200x675)."""
    out = _render_regen_fb(
        scene, cam, key, spp=spp, height=height, width=width,
        return_stats=return_stats, **kw,
    )
    if return_stats:
        fb, segments, iters = out
        return fb.reshape(height, width, 3) / jnp.float32(spp), segments, iters
    return out.reshape(height, width, 3) / jnp.float32(spp)


@partial(
    jax.jit,
    static_argnames=("width", "height", "k", "n_pad", "max_depth", "sky_gradient"),
)
def _large_scene_pass(
    scene: Scene,
    tables,
    cam: Camera,
    key,
    *,
    width: int,
    height: int,
    k: int,
    n_pad: int,
    max_depth: int,
    sky_gradient: bool,
):
    """One pass of the large-scene renderer: k samples/pixel in a single
    batch. Camera rays are pixel-ordered (coherent) -> cluster-culled Pallas
    closest hit; bounce rays are incoherent -> dense Pallas. The batch is
    padded to the culled kernel's (128 x 128)-ray tile with far dummy rays
    whose radiance is discarded. Returns ((H, W, 3) radiance sum, segments)."""
    from raytracer_tpu.geometry.intersect import (
        intersect_scene_culled,
        intersect_scene_pallas_tables,
    )
    from raytracer_tpu.integrator.wavefront import trace

    n = width * height
    frame = camera_frame(cam, width, height)
    pix = jax.lax.broadcasted_iota(jnp.int32, (k * n, 1), 0)[:, 0] % n
    key_cam, key_trace = jax.random.split(key)
    cam_uniforms = jax.random.uniform(key_cam, (k * n, 4), jnp.float32)
    origin, direction = camera_rays(frame, pix % width, pix // width, cam_uniforms)
    pad = n_pad - k * n
    if pad:
        origin = jnp.concatenate(
            [origin, jnp.full((pad, 3), 1e7, jnp.float32)], axis=0
        )
        direction = jnp.concatenate(
            [direction, jnp.broadcast_to(jnp.float32(1.0), (pad, 3))], axis=0
        )
    radiance, segments = trace(
        scene,
        origin,
        direction,
        key_trace,
        cam.background,
        max_depth=max_depth,
        sky_gradient=sky_gradient,
        return_stats=True,
        intersect_fn=lambda sc, o, d: intersect_scene_pallas_tables(sc, tables, o, d),
        first_bounce_intersect_fn=lambda sc, o, d: intersect_scene_culled(
            sc, tables, o, d
        ),
    )
    per_pixel = radiance[: k * n].reshape(k, n, 3).sum(axis=0)
    return per_pixel.reshape(height, width, 3), segments


def _render_large_scene(
    scene,
    cam,
    settings,
    *,
    seed,
    progress,
    metrics=None,
    target_rays_per_pass=DEFAULT_TARGET_RAYS_PER_PASS,
):
    """Pass loop for scenes past LARGE_SCENE_PRIMS (see the constant's note).
    The scale analog of the reference's BVH acceleration (bvh.go:220-249):
    coherent camera batches get subtree culling; incoherent bounces use the
    dense kernel, which the culling measurably cannot beat on TPU."""
    from raytracer_tpu.geometry.intersect import build_large_scene_tables
    from raytracer_tpu.ops.culled_kernel import CULL_ROWS
    from raytracer_tpu.ops.intersect_kernel import LANES

    w, h, spp = settings.width, settings.height, settings.samples_per_pixel
    n = w * h
    tables = build_large_scene_tables(scene)  # host-side BVH clustering, once
    k = samples_per_pass_for(spp, n, target_rays_per_pass)
    tile = CULL_ROWS * LANES
    n_pad = -(-(k * n) // tile) * tile
    passes = spp // k
    key = jax.random.PRNGKey(seed)
    acc = jnp.zeros((h, w, 3), jnp.float32)
    seg_parts = []  # device scalars; synced once at the end
    # metrics.wavefront_lanes stays 0 on this path: `iters` counts passes,
    # not wavefront loop iterations, so a lanes-based occupancy would be
    # meaningless (the bounce loop runs inside trace()'s while_loop).
    for p in range(passes):
        fb, segs = _large_scene_pass(
            scene,
            tables,
            cam,
            jax.random.fold_in(key, p),
            width=w,
            height=h,
            k=k,
            n_pad=n_pad,
            max_depth=settings.max_depth,
            sky_gradient=settings.sky_gradient,
        )
        acc = acc + fb
        seg_parts.append(segs)
        if metrics is not None:
            metrics.update((p + 1) * k)
        if progress:
            print(f"pass {p + 1}/{passes} ({(p + 1) * k}/{spp} spp)", flush=True)
    if metrics is not None:
        metrics.update(
            passes * k, segments=sum(int(s) for s in seg_parts), iters=passes
        )
    return acc / jnp.float32(spp)


# Host-side BVH clustering results keyed by the identity of the scene's
# sphere-center array (kept alive by the cache entry, so ids cannot be
# reused). Bounded: repeated renders of the same scene (bench loops,
# spp-chunked renders) must not pay the ~0.2 s host build each call — it
# measurably tripled wall time at 10K prims / 16 spp.
_CLUSTER_CACHE: dict[int, tuple] = {}


# Production cluster granularity (see cluster_scene): fine clusters of
# <= CLUSTER_LEAF prims, super-clusters of <= CLUSTER_LEAF * CLUSTER_FAN.
# Round-4 sweep on v5e (tools/bench_large.py, 400x225@64spp sphere grids):
# at 10K prims leaf 128/64/32 -> 37.0/41.2/41.0 Mrays/s; at 50K leaf 64/32
# -> 19.6/19.7 and fan 16/32 a wash — the sphere tests saturate at the
# tile's ray-footprint x density, so smaller leaves stop paying below 64.
# RT_CLUSTER_LEAF / RT_CLUSTER_FAN override for probing.
CLUSTER_LEAF = 64
CLUSTER_FAN = 16


def _clustered_scene_cached(scene: Scene):
    import os

    from raytracer_tpu.geometry.bvh import cluster_scene

    max_leaf = int(os.environ.get("RT_CLUSTER_LEAF", str(CLUSTER_LEAF)))
    fan = int(os.environ.get("RT_CLUSTER_FAN", str(CLUSTER_FAN)))
    key = id(scene.sph_center)
    hit = _CLUSTER_CACHE.get(key)
    if hit is None or hit[0] is not scene.sph_center or hit[3] != (max_leaf, fan):
        hit = (
            scene.sph_center,
            *cluster_scene(scene, max_leaf=max_leaf, super_fan=fan),
            (max_leaf, fan),
        )
        if len(_CLUSTER_CACHE) >= 8:
            _CLUSTER_CACHE.pop(next(iter(_CLUSTER_CACHE)))
        _CLUSTER_CACHE[key] = hit
    return hit[1], hit[2]


def _order_front_to_back(fine: np.ndarray, sup: np.ndarray, eye: np.ndarray):
    """Sort one kind's cluster rows by eye distance. With a super level, the
    supers are sorted AND each super's fine block is sorted in place (fine
    rows must stay contiguous per super — the super's [start, count] indexes
    fine ROWS); super starts are rebuilt for the new layout."""

    def dist(rows):
        c = (rows[:, 0:3] + rows[:, 3:6]) * 0.5
        return ((c - eye) ** 2).sum(axis=1)

    if fine.shape[0] == 0:
        return fine, sup
    if sup.shape[0] == 0:
        return fine[np.argsort(dist(fine))], sup
    new_fine, new_sup = [], []
    pos = 0
    for si in np.argsort(dist(sup)):
        s, c = int(sup[si, 6]), int(sup[si, 7])
        block = fine[s : s + c]
        new_fine.append(block[np.argsort(dist(block))])
        row = sup[si].copy()
        row[6] = float(pos)
        new_sup.append(row)
        pos += c
    return np.concatenate(new_fine), np.stack(new_sup)


def cluster_for_render(scene: Scene, cam: Camera):
    """Cluster-order a large scene for the persistent kernel and sort the
    cluster tables front-to-back from the eye: camera rays (most segments)
    find their nearest hit early, so the kernel's shrinking scaled-t bound
    culls the remaining clusters — the ordered-traversal benefit of
    bvh.go:225-232. Fine-row order is free to permute within a super
    (start/count index the permuted primitive tables, not the row
    position). Returns (permuted scene, geometry.bvh.ClusterSet)."""
    from raytracer_tpu.geometry.bvh import ClusterSet

    scene, cs = _clustered_scene_cached(scene)
    eye = np.asarray(cam.look_from)
    s_fine, s_sup = _order_front_to_back(
        np.asarray(cs.sph), np.asarray(cs.sph_super), eye
    )
    q_fine, q_sup = _order_front_to_back(
        np.asarray(cs.quad), np.asarray(cs.quad_super), eye
    )
    return scene, ClusterSet(
        sph=jnp.asarray(s_fine),
        sph_super=jnp.asarray(s_sup),
        quad=jnp.asarray(q_fine),
        quad_super=jnp.asarray(q_sup),
    )


def render_image(
    scene: Scene,
    cam: Camera,
    settings: RenderSettings,
    *,
    seed: int = 0,
    target_rays_per_pass: int = DEFAULT_TARGET_RAYS_PER_PASS,
    progress: bool = False,
    regenerative: bool = True,
    metrics=None,
    bilinear_stochastic: bool | None = None,
) -> jnp.ndarray:
    """Render the full image; returns linear mean radiance (H, W, 3) f32.

    bilinear_stochastic: None (default) picks the production filter — the
    unbiased single-tap stochastic bilinear whenever the persistent kernel
    serves the render; False forces the deterministic 4-tap reference
    filter (advisor r4: the parity mode must stay reachable from the
    top-level API); True requests stochastic explicitly (still requires
    the persistent path — other paths ignore it).

    Equivalent of Camera.Render + GetPixelColor's spp averaging
    (camera.go:180-263), minus the output encoding (see postprocess/imgio).

    regenerative=True (default) uses the path-regeneration wavefront (fast);
    False uses the simple pass loop (reference implementation, also the
    shape the differentiable path uses).

    metrics: optional utils.metrics.RenderMetrics — receives per-chunk spp
    progress immediately (no device sync) and traced-segment / iteration
    totals after the last chunk (one sync at the end; SURVEY.md §5
    observability).
    """
    w, h, spp = settings.width, settings.height, settings.samples_per_pixel
    n = w * h
    key = jax.random.PRNGKey(seed)

    n_prims = scene.num_spheres + scene.num_quads
    from raytracer_tpu.ops.persistent_kernel import scene_supports_persistent

    supports = scene_supports_persistent(scene)
    if (
        regenerative
        and jax.default_backend() == "tpu"
        and n_prims > LARGE_SCENE_PRIMS
    ):
        if not supports:
            return _render_large_scene(
                scene,
                cam,
                settings,
                seed=seed,
                progress=progress,
                metrics=metrics,
                target_rays_per_pass=target_rays_per_pass,
            )

    if regenerative:
        on_tpu = jax.default_backend() == "tpu"
        use_pallas = on_tpu
        # Whole-loop-in-kernel fast path (all four texture kinds in-kernel).
        use_persistent = on_tpu and supports
        # Large scenes: permute spheres into BVH-cluster order and hand the
        # persistent kernel the cluster table for in-kernel culling.
        cluster_table = None
        if use_persistent and n_prims > CLUSTERED_SCENE_PRIMS:
            scene, cluster_table = cluster_for_render(scene, cam)
        # Wavefront sizing. Non-persistent paths: at least one full image
        # (capped) — chunking a big image through a small wavefront measured
        # 10x slower (per-call overheads + low occupancy); 1200x800@500spp
        # went 432s -> ~25s with this. Persistent path: size for ~max_slots
        # samples per LANE instead — each (64x128) tile drains independently
        # at the pace of its slowest lane, and more samples per lane averages
        # the path-length tail away (measured at 400x225@64spp: 11 slots ->
        # occupancy 0.60 / 101 Mrays/s; 40 slots -> 0.75 / 113; 64 -> 0.82 /
        # 125; 88 -> 0.86 / 123). K=64 is the VMEM ceiling: the kernel's grid
        # dimension is marked "arbitrary" so the pipeliner keeps only two
        # copies of the (3*K*rows, 128) log block (2*6.3 MB at K=64 within
        # the 16 MB budget; K=86 at 2 copies misses by 712 KB). The in-kernel
        # Perlin shader adds ~6 MB of stack temporaries, so noise scenes cap
        # lower (K=64 OOMs by 3.6 MB there; 40 fits).
        max_wavefront = 1 << 21
        img_texels = (
            # ALL images pack into one VMEM table (pack_image_table) —
            # count every padded image, not just one (review r3).
            int(
                scene.images.shape[0]
                * scene.images.shape[1]
                * scene.images.shape[2]
            )
            if scene.has_image
            else 0
        )
        max_slots = regen_max_slots(
            use_persistent, scene.has_noise, n_prims, img_texels
        )
        if use_persistent:
            from raytracer_tpu.integrator.wavefront import pick_wavefront

            # Sized for ~max_slots samples/lane AND (for scenes where the
            # kernel scans a gather band — image texels, >512-primitive
            # resolve) a small per-sample pixel jump that keeps the dynamic
            # gather bounds narrow.
            coherent = scene.has_image or (
                scene.num_spheres + scene.num_quads > 4 * 128
            )
            wavefront = pick_wavefront(
                n, spp, max_slots, hi=max_wavefront, coherent=coherent
            )
        else:
            wavefront = int(max(target_rays_per_pass, min(n, max_wavefront)))
        spp_chunk = regen_spp_chunk(spp, n, wavefront, max_slots)
        if use_persistent and spp_chunk < spp:
            # Multi-chunk render: the whole-spp sizing above hit the
            # max_wavefront cap and left samples/lane under the VMEM budget
            # (e.g. 1200x800@500spp: K=58 at the 2M-lane cap). Re-size for
            # the ACTUAL chunk so K reaches the cap — tiles drain at the
            # pace of their slowest lane and more samples per lane averages
            # the tail away (measured 144.8 -> ~172 traced Mrays/s there).
            from raytracer_tpu.integrator.wavefront import pick_wavefront

            wavefront = pick_wavefront(
                n, spp_chunk, max_slots, hi=max_wavefront, coherent=coherent
            )
            spp_chunk = regen_spp_chunk(spp, n, wavefront, max_slots)
        if metrics is not None:
            from raytracer_tpu.integrator.wavefront import strided_schedule
            from raytracer_tpu.ops.persistent_kernel import DEFAULT_ROWS, LANES

            n_lanes, num_slots, _ = strided_schedule(n, spp_chunk, wavefront)
            # Occupancy basis: the persistent kernel counts iterations per
            # (rows x 128)-lane tile (tiles drain independently); the
            # XLA-loop paths count whole-wavefront iterations over the
            # ACTUAL padded lane count, not the requested wavefront.
            metrics.wavefront_lanes = (
                DEFAULT_ROWS * LANES if use_persistent else n_lanes
            )
            metrics.retirement_log_mb = 3 * num_slots * n_lanes * 4 / 2**20
        acc = jnp.zeros((h, w, 3), jnp.float32)
        done = 0
        chunk_idx = 0
        chunk_stats = []  # device scalars; synced once after the last chunk
        while done < spp:
            step_spp = min(spp_chunk, spp - done)
            out = render_regen(
                scene,
                cam,
                jax.random.fold_in(key, chunk_idx),
                width=w,
                height=h,
                spp=step_spp,
                wavefront_size=wavefront,
                max_depth=settings.max_depth,
                sky_gradient=settings.sky_gradient,
                use_pallas=use_pallas,
                use_megakernel=use_pallas and not use_persistent,
                use_persistent=use_persistent,
                # Tighter russian-roulette cap on the persistent path: glass
                # paths at q=0.95 run ~25 bounces and a tile drains at the
                # pace of its slowest lane; q=0.75 cuts the tail to ~9 and
                # lifts measured occupancy 0.43 -> 0.60 (105 vs 78 Mrays/s
                # at 64 spp) while staying unbiased (RR throughput boost).
                rr_max_q=0.75 if use_persistent else 0.95,
                cluster_table=cluster_table,
                # Production texture filtering on the persistent path is
                # STOCHASTIC bilinear (single weighted tap, unbiased — see
                # ops/persistent_kernel.py round-4 note); the deterministic
                # 4-tap stays the parity/test reference and is selectable
                # via bilinear_stochastic=False.
                bilinear_stochastic=(
                    use_persistent
                    if bilinear_stochastic is None
                    else (bilinear_stochastic and use_persistent)
                ),
                return_stats=metrics is not None,
            )
            if metrics is not None:
                fb, segments, iters = out
                chunk_stats.append((segments, iters))
            else:
                fb = out
            acc = acc + fb * jnp.float32(step_spp)
            done += step_spp
            chunk_idx += 1
            if metrics is not None:
                metrics.update(done)
            if progress:
                print(f"spp {done}/{spp}", flush=True)
        if metrics is not None and chunk_stats:
            metrics.update(
                done,
                segments=sum(int(s) for s, _ in chunk_stats),
                iters=sum(int(i) for _, i in chunk_stats),
            )
        return acc / jnp.float32(spp)

    k = samples_per_pass_for(spp, n, target_rays_per_pass)
    passes = spp // k
    acc = jnp.zeros((h, w, 3), jnp.float32)
    for p in range(passes):
        acc = acc + render_pass(
            scene,
            cam,
            jax.random.fold_in(key, p),
            width=w,
            height=h,
            samples_per_pass=k,
            max_depth=settings.max_depth,
            sky_gradient=settings.sky_gradient,
        )
        if metrics is not None:
            metrics.update((p + 1) * k)
        if progress:
            print(f"pass {p + 1}/{passes} ({(p + 1) * k}/{spp} spp)", flush=True)
    return acc / jnp.float32(spp)


def render_scene(scene: Scene, cam: Camera, settings: RenderSettings, **kw):
    """Render and postprocess to uint8 (H, W, 3) on host."""
    linear = render_image(scene, cam, settings, **kw)
    return np.asarray(jax.device_get(to_u8(linear)))
