"""Pallas TPU kernel: fused wavefront front-half — regeneration + camera
ray generation + in-kernel PRNG + closest-hit intersection.

One kernel invocation per wavefront iteration performs, per ray tile held in
VMEM:
  1. regeneration: idle lanes owing samples advance their strided pixel
     (add/compare, constants baked) and build a fresh thin-lens camera ray
     (camera.go:265-299 math) from on-chip PRNG bits;
  2. the sphere+quad closest-hit loops of ops/intersect_kernel.py;
  3. emission of the bounce uniforms the XLA-side shade consumes.

The back half (resolve+shade from the winner row, throughput/radiance state,
russian roulette, retirement log) stays in XLA: its one irregular gather is
cheaper as a native XLA gather than any in-kernel emulation (measured — see
docs/PERF_NOTES.md), and the rest fuses well.

RNG: the per-core hardware PRNG (pltpu.prng_*), seeded per (launch, program)
— replaces three threefry streams per iteration. Keys are deterministic in
(seed, iteration, tile), so renders remain reproducible.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raytracer_tpu.ops import closest_hit_body as chb

from raytracer_tpu.ops.intersect_kernel import (
    DEFAULT_ROWS,
    INF,
    LANES,
    QUAD_DENOM_EPS,
    T_MIN,
)

TWO_PI = 6.283185307179586
# Camera/config scalar layout (f32 SMEM vector).
CAM_PIXEL00 = 0  # 3
CAM_DU = 3  # 3
CAM_DV = 6  # 3
CAM_CENTER = 9  # 3
CAM_DISK_U = 12  # 3
CAM_DISK_V = 15  # 3
CAM_DEFOCUS = 18  # > 0 -> thin lens sampling
N_CAM = 19


def _uniform(shape):
    """U[0,1) f32 from the hardware PRNG (24-bit mantissa construction).
    prng_random_bits yields *signed* int32 — bitcast to uint32 before the
    shift or half the uniforms come out negative."""
    bits = pltpu.prng_random_bits(shape)  # int32
    # Mask to 23 positive bits (Mosaic cannot cast uint32->f32).
    return (bits & 0x7FFFFF).astype(jnp.float32) * (1.0 / 8388608.0)


def _wavefront_kernel(
    # scalar prefetch
    ns_ref, nq_ref, sph_ref, quad_ref, cam_ref, seed_ref,
    # VMEM in: previous state
    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
    act_ref, rem_ref, px_ref, py_ref, sk_ref,
    # VMEM out
    t_ref, prim_ref,
    ox_o, oy_o, oz_o, dx_o, dy_o, dz_o,
    grant_ref, rem_o, px_o, py_o, sk_o,
    u0_ref, u1_ref, u2_ref, u3_ref,
    *,
    width: int, height: int, jump_px: int, jump_py: int,
):
    pid = pl.program_id(0)
    pltpu.prng_seed(seed_ref[0] + pid * 7919)

    act = act_ref[:] != 0
    rem = rem_ref[:]

    # ---- regeneration: pixel advance + camera ray ----
    grant = jnp.logical_and(jnp.logical_not(act), rem > 0)
    first = sk_ref[:] < 0
    px_adv = px_ref[:] + jump_px
    py_adv = py_ref[:] + jump_py
    carry = px_adv >= width
    px_adv = jnp.where(carry, px_adv - width, px_adv)
    py_adv = jnp.where(carry, py_adv + 1, py_adv)
    wrap = py_adv >= height
    py_adv = jnp.where(wrap, py_adv - height, py_adv)
    px = jnp.where(grant, jnp.where(first, px_ref[:], px_adv), px_ref[:])
    py = jnp.where(grant, jnp.where(first, py_ref[:], py_adv), py_ref[:])
    # NOTE: a lane's FIRST grant uses its initial pixel (set by the host),
    # later grants the advanced one — so the host initializes px/py to the
    # lane's first pixel and sample_k to -1.

    # Camera sampling (camera.go:265-299): pixel jitter + defocus disk.
    jx = _uniform(px.shape) - 0.5
    jy = _uniform(px.shape) - 0.5
    r_disk = jnp.sqrt(_uniform(px.shape))
    phi = TWO_PI * _uniform(px.shape)
    disk_x = r_disk * jnp.cos(phi)
    disk_y = r_disk * jnp.sin(phi)

    fx = px.astype(jnp.float32) + jx
    fy = py.astype(jnp.float32) + jy
    pcx = cam_ref[CAM_PIXEL00 + 0] + fx * cam_ref[CAM_DU + 0] + fy * cam_ref[CAM_DV + 0]
    pcy = cam_ref[CAM_PIXEL00 + 1] + fx * cam_ref[CAM_DU + 1] + fy * cam_ref[CAM_DV + 1]
    pcz = cam_ref[CAM_PIXEL00 + 2] + fx * cam_ref[CAM_DU + 2] + fy * cam_ref[CAM_DV + 2]
    use_disk = cam_ref[CAM_DEFOCUS] > 0.0
    cox = cam_ref[CAM_CENTER + 0] + jnp.where(
        use_disk, disk_x * cam_ref[CAM_DISK_U + 0] + disk_y * cam_ref[CAM_DISK_V + 0], 0.0
    )
    coy = cam_ref[CAM_CENTER + 1] + jnp.where(
        use_disk, disk_x * cam_ref[CAM_DISK_U + 1] + disk_y * cam_ref[CAM_DISK_V + 1], 0.0
    )
    coz = cam_ref[CAM_CENTER + 2] + jnp.where(
        use_disk, disk_x * cam_ref[CAM_DISK_U + 2] + disk_y * cam_ref[CAM_DISK_V + 2], 0.0
    )

    ox = jnp.where(grant, cox, ox_ref[:])
    oy = jnp.where(grant, coy, oy_ref[:])
    oz = jnp.where(grant, coz, oz_ref[:])
    dx = jnp.where(grant, pcx - cox, dx_ref[:])
    dy = jnp.where(grant, pcy - coy, dy_ref[:])
    dz = jnp.where(grant, pcz - coz, dz_ref[:])

    # ---- closest hit (identical math to ops/intersect_kernel.py) ----
    a = dx * dx + dy * dy + dz * dz
    inv_a = 1.0 / a
    d_dot_o = dx * ox + dy * oy + dz * oz
    o_sq = ox * ox + oy * oy + oz * oz
    # Sphere candidates compare in *scaled* t-space (t' = t*a, a > 0 per
    # lane): skips two inv_a multiplies per sphere; the winner is rescaled
    # once after the loops. Quads scale their t by a to stay comparable.
    tmin_a = T_MIN * a
    t0_best = jnp.full(ox.shape, INF)
    prim_best = jnp.full(ox.shape, -1, jnp.int32)

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

    # ---- outputs ----
    t_ref[:] = t_best * inv_a  # back from scaled-t space (INF stays INF)
    prim_ref[:] = prim_best
    ox_o[:] = ox
    oy_o[:] = oy
    oz_o[:] = oz
    dx_o[:] = dx
    dy_o[:] = dy
    dz_o[:] = dz
    grant_ref[:] = grant.astype(jnp.int32)
    rem_o[:] = rem - grant.astype(jnp.int32)
    px_o[:] = px
    py_o[:] = py
    sk_o[:] = jnp.where(grant, sk_ref[:] + 1, sk_ref[:])
    u0_ref[:] = _uniform(ox.shape)  # sphere sample u
    u1_ref[:] = _uniform(ox.shape)  # sphere sample v
    u2_ref[:] = _uniform(ox.shape)  # dielectric coin
    u3_ref[:] = _uniform(ox.shape)  # russian roulette


def pack_camera_scalars(frame) -> jnp.ndarray:
    """(N_CAM,) f32 from a core.camera.CameraFrame."""
    return jnp.concatenate(
        [
            frame.pixel00,
            frame.pixel_du,
            frame.pixel_dv,
            frame.center,
            frame.defocus_disk_u,
            frame.defocus_disk_v,
            frame.defocus_angle_radians[None],
        ]
    ).astype(jnp.float32)


@partial(
    jax.jit,
    static_argnames=("width", "height", "jump_px", "jump_py", "rows"),
)
def wavefront_step_pallas(
    sph_table,
    quad_table,
    cam_scalars,
    seed,
    origin,
    direction,
    active,
    remaining,
    px,
    py,
    sample_k,
    *,
    width: int,
    height: int,
    jump_px: int,
    jump_py: int,
    rows: int | None = None,
):
    """Fused regen+camera+intersect step.

    Args: state arrays (N,3)/(N,); seed: () i32 varied per iteration.
    Returns dict with t, prim, origin, direction, grant, remaining, px, py,
    sample_k, uniforms (N, 4).
    """
    n = origin.shape[0]
    if rows is None:
        rows = DEFAULT_ROWS
    tile = rows * LANES
    assert n % tile == 0, (n, tile)
    grid = n // tile
    rowsN = n // LANES

    def planar_f(x):
        return x.reshape(rowsN, LANES)

    ins = (
        [planar_f(origin[:, i]) for i in range(3)]
        + [planar_f(direction[:, i]) for i in range(3)]
        + [
            active.astype(jnp.int32).reshape(rowsN, LANES),
            remaining.reshape(rowsN, LANES),
            px.reshape(rowsN, LANES),
            py.reshape(rowsN, LANES),
            sample_k.reshape(rowsN, LANES),
        ]
    )

    spec = pl.BlockSpec((rows, LANES), lambda i, *_: (i, 0), memory_space=pltpu.VMEM)
    f32 = jnp.float32
    i32 = jnp.int32
    out_shapes = (
        [jax.ShapeDtypeStruct((rowsN, LANES), f32)]  # t
        + [jax.ShapeDtypeStruct((rowsN, LANES), i32)]  # prim
        + [jax.ShapeDtypeStruct((rowsN, LANES), f32)] * 6  # o, d
        + [jax.ShapeDtypeStruct((rowsN, LANES), i32)] * 5  # grant, rem, px, py, sk
        + [jax.ShapeDtypeStruct((rowsN, LANES), f32)] * 4  # uniforms
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(grid,),
        in_specs=[spec] * len(ins),
        out_specs=[spec] * len(out_shapes),
    )
    kernel = partial(
        _wavefront_kernel,
        width=width,
        height=height,
        jump_px=jump_px,
        jump_py=jump_py,
    )
    ns = jnp.asarray([sph_table.shape[0]], i32)
    nq = jnp.asarray([quad_table.shape[0]], i32)
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
    )(
        ns, nq, sph_table.reshape(-1), quad_table.reshape(-1), cam_scalars,
        jnp.asarray([seed], i32), *ins,
    )

    (t, prim, ox, oy, oz, dx, dy, dz, grant, rem, pxo, pyo, sko,
     u0, u1, u2, u3) = outs

    def flat(x):
        return x.reshape(n)

    return dict(
        t=flat(t),
        prim=flat(prim),
        origin=jnp.stack([flat(ox), flat(oy), flat(oz)], axis=1),
        direction=jnp.stack([flat(dx), flat(dy), flat(dz)], axis=1),
        grant=flat(grant) != 0,
        remaining=flat(rem),
        px=flat(pxo),
        py=flat(pyo),
        sample_k=flat(sko),
        uniforms=jnp.stack([flat(u0), flat(u1), flat(u2), flat(u3)], axis=1),
    )
