"""Pallas TPU kernel: fused closest-hit ray-scene intersection.

The jnp dense path (geometry/intersect.py) materializes (N, S) candidate
matrices in HBM; this kernel keeps the whole reduction in VMEM: each grid
program owns a (ROWS, 128) tile of rays, loops over the scene's primitives
with their parameters broadcast from SMEM scalars, and carries only the
running best (t, prim) per lane. Scene tables ride in scalar-prefetch SMEM
(hundreds of f32 scalars — tiny).

Math identical to geometry/intersect.py (and therefore to the reference
hittables.go:96-132, 167-194): half-b quadratic with expanded |o-c|^2 and
strict open-interval root selection; quad plane/basis test via the
precomputed av/bv triple-product vectors.

Dummy/padded rows are encoded in the tables themselves: a padded sphere has
c2r2 = +1e30 (drives the discriminant negative -> never hits) and a padded
quad has a zero normal (|n.d| < 1e-8 -> never hits), so the kernel needs no
validity masks.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raytracer_tpu.ops import closest_hit_body as chb

LANES = 128
DEFAULT_ROWS = 128  # rays per program = ROWS * LANES (swept: 128 best on v5e)
# Plain Python floats: jnp scalars here would be captured tracer constants,
# which pallas kernels reject.
INF = float("inf")
T_MIN = 1e-3
QUAD_DENOM_EPS = 1e-8


def _intersect_kernel(
    ns_ref,  # () i32 SMEM — number of spheres
    nq_ref,  # () i32 SMEM — number of quads
    sph_ref,  # (S*4,) f32 SMEM — cx, cy, cz, |c|^2 - r^2 (1e30 for dummies)
    # NOTE: scalar-prefetch tables are FLAT 1D — a 2D (S, C) SMEM operand
    # pads every row to 128 lanes (measured: 10K spheres -> 5 MB > the 1 MB
    # SMEM budget); flat layout stays at S*C*4 bytes.
    quad_ref,  # (Q*12,) f32 SMEM — nx,ny,nz,D,avx,avy,avz,bvx,bvy,bvz,qav,qbv
    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,  # (ROWS, 128) f32 VMEM
    t_ref,  # (ROWS, 128) f32 VMEM out
    prim_ref,  # (ROWS, 128) i32 VMEM out
):
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]

    a = dx * dx + dy * dy + dz * dz
    inv_a = 1.0 / a
    d_dot_o = dx * ox + dy * oy + dz * oz
    o_sq = ox * ox + oy * oy + oz * oz
    # Sphere candidates compare in *scaled* t-space (t' = t*a, a > 0 per
    # lane): skips two inv_a multiplies per sphere; the winner is rescaled
    # once after the loops. Quads scale their t by a to stay comparable.
    tmin_a = T_MIN * a

    shape = ox.shape
    t0_best = jnp.full(shape, INF)
    prim_best = jnp.full(shape, -1, jnp.int32)

    sphere_body = chb.make_sphere_body(
        sph_ref, ox, oy, oz, dx, dy, dz, d_dot_o, o_sq, a, tmin_a
    )

    t_best, prim_best = jax.lax.fori_loop(
        0, ns_ref[0], sphere_body, (t0_best, prim_best)
    )

    ns = ns_ref[0]

    quad_body = chb.make_quad_body(
        quad_ref, ox, oy, oz, dx, dy, dz, a, prim_offset=ns
    )

    t_best, prim_best = jax.lax.fori_loop(
        0, nq_ref[0], quad_body, (t_best, prim_best)
    )

    t_ref[:] = t_best * inv_a  # back from scaled-t space (INF stays INF)
    prim_ref[:] = prim_best


def pack_sphere_table(sph_center, sph_radius) -> jnp.ndarray:
    """(S, 4): cx, cy, cz, |c|^2 - r^2; dummy rows (radius == 0) get +1e30."""
    c2r2 = jnp.sum(sph_center * sph_center, -1) - sph_radius * sph_radius
    c2r2 = jnp.where(sph_radius == 0.0, 1e30, c2r2)
    return jnp.concatenate([sph_center, c2r2[:, None]], axis=1)


def pack_quad_table(qd) -> jnp.ndarray:
    """(Q, 12) from geometry.intersect.QuadDerived (dummy rows have n = 0)."""
    return jnp.concatenate(
        [
            qd.normal,
            qd.d[:, None],
            qd.av,
            qd.bv,
            qd.q_av[:, None],
            qd.q_bv[:, None],
        ],
        axis=1,
    )


@partial(jax.jit, static_argnames=("rows",))
def intersect_pallas(sph_table, quad_table, origin, direction, rows: int | None = None):
    """Closest hit for a flat ray batch.

    Args:
      sph_table: (S, 4) from pack_sphere_table.
      quad_table: (Q, 12) from pack_quad_table.
      origin, direction: (N, 3) f32 with N a multiple of rows * 128.

    Returns (t (N,) f32 with +inf miss, prim (N,) i32 with -1 miss; sphere
    ids first, then quads offset by S).
    """
    n = origin.shape[0]
    if rows is None:
        rows = DEFAULT_ROWS
    tile = rows * LANES
    assert n % tile == 0, (n, tile)
    grid = n // tile

    def planar(x):
        return x.reshape(n // LANES, LANES)

    comps = [planar(origin[:, i]) for i in range(3)] + [
        planar(direction[:, i]) for i in range(3)
    ]
    ns = jnp.asarray([sph_table.shape[0]], jnp.int32)
    nq = jnp.asarray([quad_table.shape[0]], jnp.int32)
    sph_flat = sph_table.reshape(-1)
    quad_flat = quad_table.reshape(-1)

    # index_map receives (grid_idx, *scalar_prefetch_refs).
    ray_spec = pl.BlockSpec(
        (rows, LANES), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(grid,),
        in_specs=[ray_spec] * 6,
        out_specs=[ray_spec, ray_spec],
    )
    t, prim = pl.pallas_call(
        _intersect_kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n // LANES, LANES), jnp.float32),
            jax.ShapeDtypeStruct((n // LANES, LANES), jnp.int32),
        ],
    )(ns, nq, sph_flat, quad_flat, *comps)
    return t.reshape(n), prim.reshape(n)
