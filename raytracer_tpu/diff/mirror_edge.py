"""Mirror-reflected silhouette gradients: one specular bounce of edge
sampling (round-5 VERDICT #4).

diff/boundary.py samples PRIMARY silhouettes; a blocker seen only in a flat
metal mirror (materials.go:44-75, fuzz = 0) still produces a sharp
discontinuity curve in the image — the reflected silhouette — that neither
interior AD nor the primary/shadow edge terms see (quantified by
tests/test_mirror_edge.py: FD measures the full gradient, every other
estimator reports ~0).

Key observation: ANY discontinuity curve in image space contributes the
same Reynolds-transport boundary term

    dI/dtheta = ... + (L_in - L_out) * (dx/dtheta . n_hat) |dx/dphi| dphi

regardless of how many bounces created it — the machinery of boundary.py
applies verbatim once we can (a) locate the curve, (b) differentiate its
image position w.r.t. the blocker, and (c) evaluate one-sided radiance.
For a FLAT mirror all three are closed-form:

* the reflected view is a pinhole view from the MIRRORED eye
  E' = reflect(eye, mirror plane), so the blocker's silhouette in the
  mirror is its visible contour as seen from E' (sphere_contour_points);
* a contour point X lands on screen at project(reflect(X, plane)) — the
  reflection map is affine, so position/velocity/outward-direction all
  push forward through it exactly (jax.jvp);
* one-sided radiance is just the full path trace through pixels a hair
  inside/outside the curve (the metal bounce and its albedo attenuation
  happen naturally), with common random numbers so occluded segments
  cancel — identical to boundary.py's _trace_edge_radiance.

Scope: flat mirrors only (metal quads with fuzz == 0 — fuzz smooths the
reflected edge the way defocus smooths primary edges, turning the boundary
term into an interior one); sphere blockers; ONE specular bounce (a
silhouette seen via two mirrors remains out of scope; refracted
silhouettes behind GLASS are handled separately by diff/refracted_edge.py
— see diff/grad.py's limits ledger). The mirror's own geometry is not
differentiated here (its primary edges are boundary.py's job; a moving
mirror also sweeps the reflected image — a documented gap).

Pairs are enumerated densely (every quad x every sphere) with non-mirror
quads masked out at trace time, so the cost is Q*S*M edge samples —
intended for inverse-rendering scenes (tens of primitives), not the 50K
benchmark scenes.
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from raytracer_tpu.core.camera import Camera, camera_frame
from raytracer_tpu.diff.boundary import (
    _perp_basis,
    _trace_edge_radiance,
    project_to_pixels,
    sphere_contour_points,
)
from raytracer_tpu.geometry.scene import METAL


class MirrorEdgeConfig(NamedTuple):
    samples_per_contour: int = 128  # phi samples per (mirror, sphere) pair
    spp_edge: int = 8
    eps_px: float = 0.15


def _mirror_planes(scene):
    """(point (Q,3), unit normal (Q,3), is_flat_mirror (Q,)) for all quads."""
    n = jnp.cross(scene.quad_u, scene.quad_v)
    n_hat = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
    mat = scene.quad_mat
    is_mirror = (scene.mat_type[mat] == METAL) & (scene.mat_fuzz[mat] == 0.0)
    return scene.quad_q, n_hat, is_mirror


def _reflect_point(p, q0, n_hat):
    """Reflect point(s) about the plane through q0 with unit normal n_hat.
    Broadcasts over leading dims of p; q0/n_hat shaped (..., 3)."""
    d = jnp.sum((p - q0) * n_hat, axis=-1, keepdims=True)
    return p - 2.0 * d * n_hat


def _reflect_dir(v, n_hat):
    return v - 2.0 * jnp.sum(v * n_hat, axis=-1, keepdims=True) * n_hat


def make_mirror_boundary_fn(
    rebuild,
    *,
    width: int,
    height: int,
    max_depth: int,
    sky_gradient: bool = False,
    config: MirrorEdgeConfig = MirrorEdgeConfig(),
):
    """Build mirror_image(params, cam, key) -> (H, W, 3): zero forward,
    mirror-silhouette blocker gradients backward. Composes additively with
    render_linear_diff / boundary_image / shadow_image (and with the
    bucketed backend via edge_image_fns)."""
    cfg = config

    def _edge_cotangent(params, cam: Camera, key, ct):
        sg = jax.lax.stop_gradient
        params_sg = jax.tree_util.tree_map(sg, params)
        scene = rebuild(params_sg)
        cam_sg = jax.tree_util.tree_map(sg, cam)
        frame = camera_frame(cam_sg, width, height)
        eye = frame.center

        zero = jax.tree_util.tree_map(jnp.zeros_like, params)
        if scene.num_quads == 0 or scene.num_spheres == 0 or not (
            "sph_center" in params or "sph_radius" in params
        ):
            return zero, jax.tree_util.tree_map(jnp.zeros_like, cam)

        M = cfg.samples_per_contour
        phi = (jnp.arange(M, dtype=jnp.float32) + 0.5) * (2.0 * math.pi / M)
        q0, n_m, is_mirror = _mirror_planes(scene)  # sg scene: constants
        Q = q0.shape[0]
        S = scene.num_spheres

        def screen_points(p, camera):
            """Differentiable chain: blocker params (+ camera) -> reflected
            contour screen positions (Q*S*M, 2)."""
            c = p.get("sph_center", scene.sph_center)
            r = p.get("sph_radius", scene.sph_radius)
            fr = camera_frame(camera, width, height)
            eprime = _reflect_point(fr.center, q0, n_m)  # (Q,3)

            def per_mirror(e, qq, nn):
                pts, _ = sphere_contour_points(c, r, e, phi)  # (S,M,3)
                return _reflect_point(pts, qq, nn)

            refl = jax.vmap(per_mirror)(eprime, q0, n_m)  # (Q,S,M,3)
            s, t, _ = project_to_pixels(fr, refl)
            return jnp.stack([s, t], axis=-1).reshape(-1, 2)

        # ---- sg geometry: positions, tangents, outward dirs, validity ----
        c_sg = params_sg.get("sph_center", scene.sph_center)
        r_sg = params_sg.get("sph_radius", scene.sph_radius)
        eprime = _reflect_point(eye, q0, n_m)  # (Q,3)

        def contour_sg(e):
            return sphere_contour_points(c_sg, r_sg, e, phi)

        pts, valid_cs = jax.vmap(contour_sg)(eprime)  # (Q,S,M,3), (Q,S)

        # dX/dphi of the contour circle (per mirror's eye).
        dphi2 = jnp.stack([-jnp.sin(phi), jnp.cos(phi)], axis=-1)  # (M,2)

        def circle_tangent(e):
            z = c_sg - e
            d = jnp.linalg.norm(z, axis=-1, keepdims=True)
            zh = z / jnp.maximum(d, 1e-6)
            e1, e2 = _perp_basis(zh)
            r_abs = jnp.abs(r_sg)
            rho = r_abs * jnp.sqrt(
                jnp.maximum(d[:, 0] ** 2 - r_abs**2, 1e-12)
            ) / jnp.maximum(d[:, 0], 1e-6)
            return rho[:, None, None] * (
                dphi2[None, :, 0:1] * e1[:, None, :]
                + dphi2[None, :, 1:2] * e2[:, None, :]
            )  # (S,M,3)

        dpts = jax.vmap(circle_tangent)(eprime)  # (Q,S,M,3)
        n3d = pts - c_sg[None, :, None, :]
        n3d = n3d / jnp.maximum(
            jnp.linalg.norm(n3d, axis=-1, keepdims=True), 1e-12
        )
        # Push everything through the (affine) reflection, then project.
        nb = n_m[:, None, None, :]
        qb = q0[:, None, None, :]
        refl = _reflect_point(pts, qb, nb)
        drefl = _reflect_dir(dpts, nb)
        nrefl = _reflect_dir(n3d, nb)

        def proj2(pp):
            s, t, _ = project_to_pixels(frame, pp)
            return jnp.stack([s, t], axis=-1)

        x_sg, tangent = jax.jvp(proj2, (refl,), (drefl,))
        _, out2d = jax.jvp(proj2, (refl,), (nrefl,))
        _, _, front = project_to_pixels(frame, refl)

        # Blocker must be on the eye's side of the mirror plane (a sphere
        # behind the mirror is seen directly, not in reflection).
        side_e = jnp.sum((eye - q0) * n_m, axis=-1)  # (Q,)
        side_c = jnp.sum(
            (c_sg[None, :, :] - q0[:, None, :]) * n_m[:, None, :], axis=-1
        )  # (Q,S)
        same_side = side_e[:, None] * side_c > 0.0

        valid = (
            is_mirror[:, None, None]
            & valid_cs[:, :, None]
            & same_side[:, :, None]
            & front
        ).reshape(-1)
        x_sg = x_sg.reshape(-1, 2)
        tangent = tangent.reshape(-1, 2)
        out2d = out2d.reshape(-1, 2)

        # The screen point must actually SEE this mirror: its primary ray's
        # winner must be this quad (prim id = num_spheres + quad index).
        from raytracer_tpu.geometry.intersect import closest_hit_t_prim

        target = (
            frame.pixel00
            + x_sg[:, 0:1] * frame.pixel_du
            + x_sg[:, 1:2] * frame.pixel_dv
        )
        o_pr = jnp.broadcast_to(frame.center, target.shape)
        _, prim_pr = closest_hit_t_prim(scene, o_pr, target - o_pr)
        want_prim = S + jnp.repeat(
            jnp.arange(Q, dtype=jnp.int32), S * M
        )
        valid = valid & (prim_pr == want_prim)

        # ---- Reynolds weight (identical scaffolding to boundary.py) ----
        tan_norm = jnp.linalg.norm(tangent, axis=-1)
        that = tangent / jnp.maximum(tan_norm, 1e-12)[:, None]
        n_hat2 = jnp.stack([that[:, 1], -that[:, 0]], axis=-1)
        out_dot = jnp.sum(n_hat2 * out2d, axis=-1)
        n_hat2 = jnp.where((out_dot < 0.0)[:, None], -n_hat2, n_hat2)
        in_img = (
            (x_sg[:, 0] > -0.5) & (x_sg[:, 0] < width - 0.5)
            & (x_sg[:, 1] > -0.5) & (x_sg[:, 1] < height - 0.5)
        )
        ok = (
            valid & in_img & jnp.isfinite(x_sg).all(axis=-1)
            & (jnp.abs(out_dot) > 1e-9)
        )

        tr = partial(
            _trace_edge_radiance, scene, frame, key=key,
            background=cam_sg.background, max_depth=max_depth,
            sky_gradient=sky_gradient, spp_edge=cfg.spp_edge,
        )
        # sqrt-epsilon extrapolation for the curved inside, as boundary.py.
        l_in1 = tr(x_px=x_sg - cfg.eps_px * n_hat2)
        l_in4 = tr(x_px=x_sg - 4.0 * cfg.eps_px * n_hat2)
        l_in = 2.0 * l_in1 - l_in4
        l_out = tr(x_px=x_sg + cfg.eps_px * n_hat2)

        ix = jnp.clip(jnp.round(x_sg[:, 0]).astype(jnp.int32), 0, width - 1)
        iy = jnp.clip(jnp.round(x_sg[:, 1]).astype(jnp.int32), 0, height - 1)
        ct_px = ct[iy, ix, :]
        dl = 2.0 * math.pi / M
        w = (
            jnp.sum(ct_px * (l_in - l_out), axis=-1)
            * tan_norm * dl * ok.astype(jnp.float32)
        )
        w = sg(jnp.where(jnp.isfinite(w), w, 0.0))
        n_sg2 = sg(n_hat2)

        def scalar(p, camera):
            x = screen_points(p, camera)
            return jnp.sum(w * jnp.sum(x * n_sg2, axis=-1))

        grads, cam_grads = jax.grad(scalar, argnums=(0, 1))(params, cam)
        return grads, cam_grads

    @jax.custom_vjp
    def _mirror_image(params, cam, key_bits_f32):
        return jnp.zeros((height, width, 3), jnp.float32)

    def fwd(params, cam, key_bits_f32):
        return (
            jnp.zeros((height, width, 3), jnp.float32),
            (params, cam, key_bits_f32),
        )

    def bwd(res, ct):
        params, cam, key_bits_f32 = res
        key = jax.random.wrap_key_data(
            jax.lax.bitcast_convert_type(key_bits_f32, jnp.uint32)
        )
        g, g_cam = _edge_cotangent(params, cam, key, ct)
        return g, g_cam, jnp.zeros_like(key_bits_f32)

    _mirror_image.defvjp(fwd, bwd)

    def mirror_image(params, cam: Camera, key):
        bits = jax.lax.bitcast_convert_type(
            jax.random.key_data(key), jnp.float32
        )
        return _mirror_image(params, cam, bits)

    return mirror_image
