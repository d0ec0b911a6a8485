"""The ONE copy of the in-kernel closest-hit loop bodies.

Every Pallas kernel (ops/intersect_kernel, ops/wavefront_kernel,
ops/persistent_kernel, ops/culled_kernel) runs the same per-primitive
candidate math over its (rows, 128) ray tile; this module is the single
source of truth so a numerical fix cannot drift between kernels (the
NaN-robust slab fix and the scaled-t change each had to be hand-replicated
four times before this existed).

Conventions shared by all kernels:

* Tables are FLAT 1D SMEM refs — spheres (S*4,) as [cx, cy, cz, |c|²-r²]
  (hittables.go:96-132's half-b quadratic with the |c|²-2o·c+|o|² expansion),
  quads (Q*12,) as [n, n̂·Q, av, bv, Q·av, Q·bv] (hittables.go:149-194).
* Candidates compare in *scaled* t-space (t' = t·a, a = |d|² > 0 per lane):
  skips two inv_a multiplies per sphere; the caller rescales the winner once.
* No feasibility masks on the sphere: sqrt(disc < 0) = NaN and NaN
  comparisons are false, so infeasible candidates fall through to INF.
* Strict open interval (t > T_MIN), matching Interval.In (bvh.go:18-20).

The factories close over a kernel's ray registers and return fori_loop
bodies `(i, (t_best, prim_best)) -> (t_best, prim_best)`; loop bounds,
unrolling, and cluster ranging stay with each kernel.
"""

from __future__ import annotations

import jax.numpy as jnp

INF = float("inf")
T_MIN = 1e-3
QUAD_DENOM_EPS = 1e-8


def make_sphere_body(sph_ref, ox, oy, oz, dx, dy, dz, d_dot_o, o_sq, a, tmin_a):
    """Sphere candidate body. `prim id` recorded is the table row index i."""

    def sphere_body(i, carry):
        t_best, p_best = carry
        base = i * 4
        cx = sph_ref[base]
        cy = sph_ref[base + 1]
        cz = sph_ref[base + 2]
        c2r2 = sph_ref[base + 3]
        d_dot_c = dx * cx + dy * cy + dz * cz
        o_dot_c = ox * cx + oy * cy + oz * cz
        half_b = d_dot_o - d_dot_c
        c = o_sq - 2.0 * o_dot_c + c2r2
        disc = half_b * half_b - a * c
        sq = jnp.sqrt(disc)  # NaN (disc<0) -> rejected by comparisons
        nhb = -half_b
        t0s = nhb - sq
        t1s = nhb + sq
        t_cand = jnp.where(t0s > tmin_a, t0s, jnp.where(t1s > tmin_a, t1s, INF))
        better = t_cand < t_best
        return jnp.where(better, t_cand, t_best), jnp.where(better, i, p_best)

    return sphere_body


def make_quad_body(quad_ref, ox, oy, oz, dx, dy, dz, a, prim_offset,
                   carry_uv: bool = False):
    """Quad candidate body. `prim id` recorded is prim_offset + qi (callers
    pass their sphere count so quads number after spheres).

    carry_uv=True threads the winner's (alpha, beta) plane coordinates
    through the carry — (t, prim, alpha, beta) — for kernels that shade
    image textures on quads in-kernel (quad UV = (alpha, beta),
    hittables.go:183-194)."""

    def quad_body(qi, carry):
        if carry_uv:
            t_best, p_best, a_best, b_best = carry
        else:
            t_best, p_best = carry
        qb = qi * 12
        nx = quad_ref[qb]
        ny = quad_ref[qb + 1]
        nz = quad_ref[qb + 2]
        dplane = quad_ref[qb + 3]
        d_n = dx * nx + dy * ny + dz * nz
        o_n = ox * nx + oy * ny + oz * nz
        denom_ok = jnp.abs(d_n) >= QUAD_DENOM_EPS
        t = (dplane - o_n) / jnp.where(denom_ok, d_n, 1.0)
        avx = quad_ref[qb + 4]
        avy = quad_ref[qb + 5]
        avz = quad_ref[qb + 6]
        alpha = (
            (ox * avx + oy * avy + oz * avz)
            + t * (dx * avx + dy * avy + dz * avz)
            - quad_ref[qb + 10]
        )
        bvx = quad_ref[qb + 7]
        bvy = quad_ref[qb + 8]
        bvz = quad_ref[qb + 9]
        beta = (
            (ox * bvx + oy * bvy + oz * bvz)
            + t * (dx * bvx + dy * bvy + dz * bvz)
            - quad_ref[qb + 11]
        )
        ok = (
            denom_ok
            & (t > T_MIN)
            & (alpha >= 0.0)
            & (alpha <= 1.0)
            & (beta >= 0.0)
            & (beta <= 1.0)
        )
        t_cand = jnp.where(ok, t * a, INF)  # scaled-t space (module note)
        better = t_cand < t_best
        out = (
            jnp.where(better, t_cand, t_best),
            jnp.where(better, prim_offset + qi, p_best),
        )
        if carry_uv:
            out = out + (
                jnp.where(better, alpha, a_best),
                jnp.where(better, beta, b_best),
            )
        return out

    return quad_body
