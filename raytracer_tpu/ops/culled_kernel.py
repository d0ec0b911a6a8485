"""Pallas TPU kernel: cluster-culled closest-hit for LARGE scenes
(FALLBACK path — see note below).

Brute force tests every sphere against every ray (~26 VPU ops per pair) —
right for the reference's ~500 primitives (SIMD-coherent, VPU-bound), linear
in scene size. This kernel adds the TPU-idiomatic analog of BVH traversal:

* Host side: primitives are grouped into G spatial clusters (taken from the
  BVH top levels) and the sphere table is laid out cluster-contiguous.
* In-kernel, for each cluster: a cheap slab test of all tile rays against
  the cluster AABB, a vector->scalar any-reduce, and `lax.cond` SKIPS the
  cluster's sphere loop when NO ray in the tile can hit it. Camera rays
  arrive in natural pixel order (coherent); with coherent tiles most
  clusters are skipped, so cost scales with clusters-touched instead of
  total primitives. Per-lane predication cannot skip work on 1024-lane
  vregs — only tile-uniform (scalar) conditions can (SURVEY.md §7).

Quads are tested brute-force (scenes with huge quad counts would cluster
them the same way).

ROUND-3 STATUS: large scenes the persistent kernel supports now run the
same cluster-culling idea INSIDE ops/persistent_kernel.py (11x faster —
docs/PERF_NOTES.md); this standalone kernel remains only as the fallback
for large scenes the persistent kernel cannot shade in-kernel (rng-table
Perlin, multiple images, image-on-quad, bilinear) via
render/driver._render_large_scene.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raytracer_tpu.ops import closest_hit_body as chb

from raytracer_tpu.ops.intersect_kernel import (
    INF,
    LANES,
    QUAD_DENOM_EPS,
    T_MIN,
)

CULL_ROWS = 128  # rays per tile = CULL_ROWS * LANES


def _culled_kernel(
    nc_ref,  # () i32 — number of clusters
    nq_ref,  # (2,) i32 — number of quads, global sphere count
    cl_ref,  # (G*8,) f32 flat — cluster AABB min(3), max(3), start, count
    order_ref,  # (8*G,) i32 — per-octant front-to-back cluster order
    sph_ref,  # (S*4,) f32 flat — cx, cy, cz, c2r2; cluster-ordered
    quad_ref,  # (Q*12,) f32 flat
    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
    t_ref, prim_ref,
):
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]

    a = dx * dx + dy * dy + dz * dz
    inv_a = 1.0 / a
    d_dot_o = dx * ox + dy * oy + dz * oz
    o_sq = ox * ox + oy * oy + oz * oz
    tmin_a = T_MIN * a
    # Slab-test inverses: a ray with an exactly-zero direction component whose
    # origin lies ON the box plane would produce 0*inf = NaN; NaN comparisons
    # are all-false, dropping the ray from any_hit and potentially FALSELY
    # culling a cluster it hits. Nudge zero components to a sign-preserving
    # tiny so inf never appears and the cull stays conservative.
    _SLAB_TINY = 1e-30
    safe_dx = jnp.where(jnp.abs(dx) < _SLAB_TINY, jnp.where(dx < 0, -_SLAB_TINY, _SLAB_TINY), dx)
    safe_dy = jnp.where(jnp.abs(dy) < _SLAB_TINY, jnp.where(dy < 0, -_SLAB_TINY, _SLAB_TINY), dy)
    safe_dz = jnp.where(jnp.abs(dz) < _SLAB_TINY, jnp.where(dz < 0, -_SLAB_TINY, _SLAB_TINY), dz)
    inv_dx = 1.0 / safe_dx
    inv_dy = 1.0 / safe_dy
    inv_dz = 1.0 / safe_dz

    t_best = jnp.full(ox.shape, INF)
    prim_best = jnp.full(ox.shape, -1, jnp.int32)

    # Tile octant from the first ray (rays are sorted octant-major, so tiles
    # are ~uniform); selects the front-to-back cluster ordering, which lets
    # the shrinking t_best reject far clusters.
    oct_id = (
        (dx_ref[0, 0] > 0).astype(jnp.int32)
        + 2 * (dy_ref[0, 0] > 0).astype(jnp.int32)
        + 4 * (dz_ref[0, 0] > 0).astype(jnp.int32)
    )
    n_clusters = nc_ref[0]

    sphere_body = chb.make_sphere_body(
        sph_ref, ox, oy, oz, dx, dy, dz, d_dot_o, o_sq, a, tmin_a
    )

    def sphere_range(start, count, carry):
        return jax.lax.fori_loop(start, start + count, sphere_body, carry)

    def cluster_body(ci, carry):
        c = order_ref[oct_id * n_clusters + ci]
        cb = c * 8
        bmin_x = cl_ref[cb]
        bmin_y = cl_ref[cb + 1]
        bmin_z = cl_ref[cb + 2]
        bmax_x = cl_ref[cb + 3]
        bmax_y = cl_ref[cb + 4]
        bmax_z = cl_ref[cb + 5]
        t_b, p_b = carry
        # Slab test vs current best (scaled-t space: t_best is t*a, so
        # compare slab ts (plain t) against t_best * inv_a).
        tx0 = (bmin_x - ox) * inv_dx
        tx1 = (bmax_x - ox) * inv_dx
        lo = jnp.minimum(tx0, tx1)
        hi = jnp.maximum(tx0, tx1)
        ty0 = (bmin_y - oy) * inv_dy
        ty1 = (bmax_y - oy) * inv_dy
        lo = jnp.maximum(lo, jnp.minimum(ty0, ty1))
        hi = jnp.minimum(hi, jnp.maximum(ty0, ty1))
        tz0 = (bmin_z - oz) * inv_dz
        tz1 = (bmax_z - oz) * inv_dz
        lo = jnp.maximum(lo, jnp.minimum(tz0, tz1))
        hi = jnp.minimum(hi, jnp.maximum(tz0, tz1))
        lo = jnp.maximum(lo, T_MIN)
        hi = jnp.minimum(hi, t_b * inv_a)
        any_hit = jnp.any(lo < hi)

        start = cl_ref[cb + 6].astype(jnp.int32)
        count = cl_ref[cb + 7].astype(jnp.int32)
        return jax.lax.cond(
            any_hit,
            lambda cc: sphere_range(start, count, cc),
            lambda cc: cc,
            (t_b, p_b),
        )

    t_best, prim_best = jax.lax.fori_loop(
        0, nc_ref[0], cluster_body, (t_best, prim_best)
    )

    # The winning sphere id here is the CLUSTER-ORDERED row index; the XLA
    # wrapper translates it to the global id via the orig_ids map (per-lane
    # dynamic row reads are not vectorizable in-kernel).
    ns_total = nq_ref[1]  # global sphere count (for the quad prim offset)

    quad_body = chb.make_quad_body(
        quad_ref, ox, oy, oz, dx, dy, dz, a, prim_offset=ns_total
    )

    t_best, prim_best = jax.lax.fori_loop(
        0, nq_ref[0], quad_body, (t_best, prim_best)
    )

    t_ref[:] = t_best * inv_a
    prim_ref[:] = prim_best


def build_clusters(scene, bvh=None, max_leaf: int = 128):
    """Host-side clustering from the BVH: cut the tree at subtrees holding
    <= max_leaf SPHERES; returns (cluster_table (G,8) f32, sphere_table
    (S,8) f32 cluster-ordered, orig_sphere_id (S,) i32)."""
    from raytracer_tpu.geometry.bvh import build_bvh, primitive_bounds

    if bvh is None:
        bvh = build_bvh(scene, leaf_size=8)
    box_min = np.asarray(bvh.box_min)
    box_max = np.asarray(bvh.box_max)
    skip = np.asarray(bvh.skip)
    leaf_start = np.asarray(bvh.leaf_start)
    leaf_count = np.asarray(bvh.leaf_count)
    order = np.asarray(bvh.prim_order)
    ns = scene.num_spheres

    # Subtree primitive counts via the preorder/skip structure.
    m = len(skip)
    counts = np.zeros(m, np.int64)
    for i in range(m - 1, -1, -1):
        if leaf_start[i] >= 0:
            counts[i] = leaf_count[i]
        else:
            left = i + 1
            right = skip[left]
            counts[i] = counts[left] + (counts[right] if right < m else 0)

    clusters = []  # (node_index)
    i = 0
    while i < m:
        if counts[i] <= max_leaf or leaf_start[i] >= 0:
            clusters.append(i)
            i = skip[i]
        else:
            i += 1

    def subtree_prims(node):
        out = []
        j = node
        end = skip[node]
        while j < end:
            if leaf_start[j] >= 0:
                s, c = leaf_start[j], leaf_count[j]
                out.extend(order[s : s + c])
            j += 1
        return out

    centers = np.asarray(scene.sph_center)
    radii = np.asarray(scene.sph_radius)
    c2r2 = (centers * centers).sum(-1) - radii * radii
    c2r2 = np.where(radii == 0.0, 1e30, c2r2)

    cl_rows = []
    sph_rows = []
    orig_ids = []
    bmin, bmax = primitive_bounds(scene)
    for node in clusters:
        prims = [p for p in subtree_prims(node) if p < ns]  # spheres only
        if not prims:
            continue
        start = len(sph_rows)
        for p in prims:
            sph_rows.append(
                [centers[p, 0], centers[p, 1], centers[p, 2], c2r2[p]]
            )
            orig_ids.append(p)
        pmin = bmin[prims].min(axis=0)
        pmax = bmax[prims].max(axis=0)
        cl_rows.append(
            [pmin[0], pmin[1], pmin[2], pmax[0], pmax[1], pmax[2],
             float(start), float(len(prims))]
        )
    if not sph_rows:  # all-dummy scene
        sph_rows = [[0, 0, 0, 1e30]]
        orig_ids = [0]
        cl_rows = [[0, 0, 0, 0, 0, 0, 0.0, 1.0]]
    cl = np.array(cl_rows, np.float32)
    centers_g = (cl[:, 0:3] + cl[:, 3:6]) * 0.5
    orders = []
    for oct_id in range(8):
        sign = np.array(
            [1.0 if oct_id & 1 else -1.0,
             1.0 if oct_id & 2 else -1.0,
             1.0 if oct_id & 4 else -1.0]
        )
        orders.append(np.argsort(centers_g @ sign, kind="stable"))
    return (
        jnp.asarray(cl),
        jnp.asarray(np.array(orders, np.int32)),  # (8, G) front-to-back
        jnp.asarray(np.array(sph_rows, np.float32)),
        jnp.asarray(np.array(orig_ids, np.int32)),
    )


@partial(jax.jit, static_argnames=("rows",))
def intersect_pallas_culled(
    cluster_table,
    cluster_order,
    sph_table_cl,
    orig_ids,
    quad_table,
    ns_total,
    origin,
    direction,
    rows: int = CULL_ROWS,
):
    """Closest hit with cluster culling. Inputs are *already sorted* rays
    (see sort_rays); returns (t, prim) with prim in GLOBAL numbering
    (spheres 0..S-1, quads S..S+Q-1)."""
    n = origin.shape[0]
    tile = rows * LANES
    assert n % tile == 0, (n, tile)
    grid = n // tile
    rowsN = n // LANES

    def planar(x):
        return x.reshape(rowsN, LANES)

    comps = [planar(origin[:, i]) for i in range(3)] + [
        planar(direction[:, i]) for i in range(3)
    ]
    nc = jnp.asarray([cluster_table.shape[0]], jnp.int32)
    nq = jnp.asarray([quad_table.shape[0], ns_total], jnp.int32)

    spec = pl.BlockSpec((rows, LANES), lambda i, *_: (i, 0), memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(grid,),
        in_specs=[spec] * 6,
        out_specs=[spec, spec],
    )
    t, prim_cl = pl.pallas_call(
        _culled_kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((rowsN, LANES), jnp.float32),
            jax.ShapeDtypeStruct((rowsN, LANES), jnp.int32),
        ],
    )(
        nc, nq, cluster_table.reshape(-1), cluster_order.reshape(-1),
        sph_table_cl.reshape(-1), quad_table.reshape(-1), *comps,
    )
    t = t.reshape(n)
    prim_cl = prim_cl.reshape(n)
    # Translate cluster-ordered sphere rows to global sphere ids.
    is_sph = (prim_cl >= 0) & (prim_cl < ns_total)
    prim = jnp.where(
        is_sph, orig_ids[jnp.clip(prim_cl, 0, orig_ids.shape[0] - 1)], prim_cl
    )
    return t, prim


# (A ray-sorting permutation helper `sort_rays` lived here through round 2
# but was never wired into a production path: the large-scene render now
# happens INSIDE the persistent kernel, whose lanes cannot be permuted
# mid-flight — coherence comes from the small-jump pixel schedule instead
# (integrator.wavefront.pick_wavefront). Deleted round 3 per the
# tested-but-unused housekeeping rule.)
