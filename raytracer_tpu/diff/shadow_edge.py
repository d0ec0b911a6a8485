"""Secondary-discontinuity (shadow-edge) gradients via path-space edge
sampling from receiver points.

diff/boundary.py handles PRIMARY visibility: silhouettes as seen from the
camera. This module adds the next order — silhouettes as seen from the
FIRST-BOUNCE receiver point: when an occluder (or an area light's own rim)
sweeps its projected edge across the hemisphere of scatter directions above
a diffuse receiver, the one-bounce radiance integrand jumps, and interior
autodiff misses the moving-boundary term entirely (quantified in
tests/test_boundary_grad.py::test_shadow_edge_bias_quantified: FD -0.124 vs
interior/primary-boundary AD 0.000 on a blocker-position axis).

Derivation. The expected one-bounce contribution at a receiver y with
normal n_y and Lambertian albedo rho is

    E(theta) = rho * INT_hemisphere L(omega; theta) p(omega) d(omega),

with p = cos/pi (the reference's `normal + unit sphere` scatter is exactly
cosine-distributed, vec3.go:182-190 + materials.go:33-42). An occluder B
projects a region Omega(theta) on the direction sphere; L jumps across its
boundary curve omega(phi; theta). Reynolds transport gives the boundary
term

    d E/d theta |_boundary =
      rho * SUM_samples (L_in - L_out)(omega) * p(omega)
            * (d omega/d theta . n_hat) * ||d omega/d phi|| * d phi,

with n_hat the outward (unoccluded-side) unit normal of the curve in the
tangent plane at omega — the direction-sphere analog of the image-space
formula in diff/boundary.py, and the same estimator shape: common-random-
number radiance pairs a hair to each side of the edge (so already-occluded
edge segments cancel), weights stop-gradiented, and the parameter velocity
injected by differentiating omega(z(theta), y) = (z - y)/||z - y|| through
a scalar surrogate SUM sg(w) * (omega(theta) . sg(n_hat)).

Edge sources per receiver: every quad's 4 edges (this covers BOTH shadow
blockers and the area light's own rim — the latter carries emitted-vs-
background jumps, i.e. light-geometry gradients) and every sphere's visible
contour from y (closed form, boundary.sphere_contour_points with eye = y).

Scope (documented): first-bounce Lambertian receivers (deeper-bounce shadow
edges and glossy/dielectric receivers are not sampled — their BSDF is not
the cosine density this derivation folds in); receiver motion is frozen
(gradients flow to the EDGE-CASTING geometry z(theta), not through y —
receiver-silhouette motion is the primary term, handled by diff/boundary).

Reference: the estimator family is Li et al. 2018 ("Differentiable Monte
Carlo Ray Tracing through Edge Sampling") secondary edges, specialized to
this framework's analytic primitives; the reference renderer
(/root/reference) has no autodiff at all — this is north-star capability
(BASELINE.md gradient axis).
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from raytracer_tpu.core.camera import Camera, camera_frame, camera_rays
from raytracer_tpu.diff.boundary import _perp_basis, quad_edge_points, sphere_contour_points
from raytracer_tpu.geometry.intersect import intersect_scene
from raytracer_tpu.geometry.scene import LAMBERTIAN
from raytracer_tpu.materials.textures import eval_texture


class ShadowEdgeConfig(NamedTuple):
    """Static shadow-edge sampling knobs. Costs scale as
    receivers x (4 * Q * samples_per_quad_edge + S * samples_per_sphere)
    x 3 traces x spp_edge."""

    samples_per_quad_edge: int = 8  # per straight edge (x4 edges)
    samples_per_sphere: int = 32  # phi samples around each contour circle
    spp_edge: int = 2  # radiance samples per edge point per side
    eps_dir: float = 2e-3  # in/out angular offset from the edge (radians)


def _trace_dirs(scene, origin, direction, key, *, background, max_depth,
                sky_gradient, spp_edge):
    """Path-traced radiance from explicit (origin, direction) lanes,
    averaged over spp_edge CRN repeats (same key for matching lanes across
    calls — the in/out difference cancels on already-occluded segments)."""
    from raytracer_tpu.integrator.wavefront import trace

    o = jnp.tile(origin, (spp_edge, 1))
    d = jnp.tile(direction, (spp_edge, 1))
    rad = trace(
        scene, o, d, key, background,
        max_depth=max_depth, sky_gradient=sky_gradient,
    )
    return rad.reshape(spp_edge, origin.shape[0], 3).mean(axis=0)


def make_shadow_boundary_fn(
    rebuild,
    *,
    width: int,
    height: int,
    max_depth: int,
    sky_gradient: bool = False,
    config: ShadowEdgeConfig = ShadowEdgeConfig(),
):
    """Build shadow_image(params, cam, key) -> (H, W, 3).

    Forward: exact zeros (pure-gradient term, like boundary.py). Backward:
    shadow-edge cotangents for the geometry leaves present in `params`
    (sph_center, sph_radius, quad_q/u/v); every other leaf (and the camera)
    receives zeros. Compose additively with render_linear_diff and
    boundary_image before the loss.
    """
    cfg = config

    def _shadow_cotangent(params, cam: Camera, key, ct):
        sg = jax.lax.stop_gradient
        params_sg = jax.tree_util.tree_map(sg, params)
        scene = rebuild(params_sg)
        cam_sg = jax.tree_util.tree_map(sg, cam)
        frame = camera_frame(cam_sg, width, height)

        # ---- receivers: one jittered camera ray per pixel ----------------
        n_pix = width * height
        pix = jnp.arange(n_pix, dtype=jnp.int32)
        k_cam, k_tr = jax.random.split(key)
        cam_uni = jax.random.uniform(k_cam, (n_pix, 4), jnp.float32)
        o, d = camera_rays(frame, pix % width, pix // width, cam_uni)
        hit = intersect_scene(scene, o, d)
        mat_type = scene.mat_type[hit.mat_id]
        recv_ok = hit.hit & (mat_type == LAMBERTIAN)
        y = hit.point  # (P, 3)
        n_y = hit.normal
        rho = eval_texture(scene, scene.mat_tex[hit.mat_id], hit.u, hit.v, y)
        ct_px = ct.reshape(n_pix, 3)  # receiver i estimates pixel i

        zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
        pieces = []  # (omega_fn(params) -> (P*M, 3), w (P*M,), n_hat (P*M, 3))

        def finish(z_sg, dz_sg, out3d, valid_edge, dl, omega_fn):
            """Shared weight computation for one edge family.

            z_sg (P, M, 3) edge points (stop-grad), dz_sg dz/dparam_of_curve,
            out3d (P, M, 3) a 3D direction pointing out of the occluded
            region at z, valid_edge (P, M), dl the per-sample line measure,
            omega_fn(params) -> (P, M, 3) the differentiable directions."""
            rel = z_sg - y[:, None, :]
            dist = jnp.linalg.norm(rel, axis=-1, keepdims=True)
            omega = rel / jnp.maximum(dist, 1e-9)
            # d omega / d phi: pushforward of the curve velocity through
            # normalize(z - y) (y fixed).
            dom = (dz_sg - jnp.sum(dz_sg * omega, axis=-1, keepdims=True) * omega) / (
                jnp.maximum(dist, 1e-9)
            )
            tan_norm = jnp.linalg.norm(dom, axis=-1)
            that = dom / jnp.maximum(tan_norm, 1e-12)[..., None]
            n_hat = jnp.cross(that, omega)
            n_hat = n_hat / jnp.maximum(
                jnp.linalg.norm(n_hat, axis=-1, keepdims=True), 1e-12
            )
            # Orient outward: along the tangent-plane projection of out3d.
            out_t = out3d - jnp.sum(out3d * omega, axis=-1, keepdims=True) * omega
            sgn = jnp.sum(n_hat * out_t, axis=-1)
            n_hat = jnp.where((sgn < 0.0)[..., None], -n_hat, n_hat)

            cosw = jnp.sum(omega * n_y[:, None, :], axis=-1)
            p_dir = jnp.maximum(cosw, 0.0) * (1.0 / math.pi)
            ok = (
                valid_edge
                & recv_ok[:, None]
                & (p_dir > 0.0)
                & (tan_norm > 1e-9)
                & (jnp.abs(sgn) > 1e-9)
                & jnp.isfinite(omega).all(axis=-1)
            )

            P, M = omega.shape[0], omega.shape[1]
            flat = lambda a: a.reshape(P * M, *a.shape[2:])
            om_f, nh_f = flat(omega), flat(n_hat)
            # CRN radiance just inside/outside the edge; origins at the
            # receiver, lifted off the surface like the integrator does
            # (t_min plays that role in trace's closest hit).
            origin = jnp.broadcast_to(y[:, None, :], omega.shape).reshape(P * M, 3)
            tr = partial(
                _trace_dirs, scene, origin, key=k_tr,
                background=cam_sg.background, max_depth=max_depth - 1,
                sky_gradient=sky_gradient, spp_edge=cfg.spp_edge,
            )
            e = cfg.eps_dir
            # Curvature extrapolation (see boundary.py): inside a curved
            # silhouette L varies like sqrt(eps) — L(0) ~ 2 L(e) - L(4e).
            l_in = 2.0 * tr(direction=om_f - e * nh_f) - tr(
                direction=om_f - 4.0 * e * nh_f
            )
            l_out = tr(direction=om_f + e * nh_f)
            jump = (l_in - l_out).reshape(P, M, 3)

            w = (
                jnp.sum(ct_px[:, None, :] * rho[:, None, :] * jump, axis=-1)
                * p_dir
                * tan_norm
                * dl
                * ok.astype(jnp.float32)
            )
            w = sg(jnp.where(jnp.isfinite(w), w, 0.0)).reshape(P * M)
            pieces.append((omega_fn, w, sg(nh_f)))

        y_sg = sg(y)

        # ---- quad edges (blockers AND area-light rims) --------------------
        if any(k in params for k in ("quad_q", "quad_u", "quad_v")) and scene.num_quads:
            Me = cfg.samples_per_quad_edge
            tau = (jnp.arange(Me, dtype=jnp.float32) + 0.5) / Me
            q_sg = params_sg.get("quad_q", scene.quad_q)
            u_sg = params_sg.get("quad_u", scene.quad_u)
            v_sg = params_sg.get("quad_v", scene.quad_v)
            pts, dpts = quad_edge_points(q_sg, u_sg, v_sg, tau)  # (Q, 4Me, 3)
            Q, M4 = pts.shape[0], pts.shape[1]
            # Out-of-region 3D hints per edge (interior lies toward
            # +v/-u/-v/+u; same table as boundary.py).
            out3d = jnp.concatenate(
                [
                    jnp.broadcast_to(-v_sg[:, None, :], (Q, Me, 3)),
                    jnp.broadcast_to(u_sg[:, None, :], (Q, Me, 3)),
                    jnp.broadcast_to(v_sg[:, None, :], (Q, Me, 3)),
                    jnp.broadcast_to(-u_sg[:, None, :], (Q, Me, 3)),
                ],
                axis=1,
            )
            z_sg = jnp.broadcast_to(pts.reshape(1, Q * M4, 3), (n_pix, Q * M4, 3))
            dz_sg = jnp.broadcast_to(dpts.reshape(1, Q * M4, 3), (n_pix, Q * M4, 3))
            o3 = jnp.broadcast_to(out3d.reshape(1, Q * M4, 3), (n_pix, Q * M4, 3))
            # Degenerate (dummy) quads have zero edge velocity -> masked by
            # the tan_norm guard in finish().
            valid = jnp.ones((n_pix, Q * M4), bool)

            def quad_omega(p):
                q = p.get("quad_q", scene.quad_q)
                u = p.get("quad_u", scene.quad_u)
                v = p.get("quad_v", scene.quad_v)
                z, _ = quad_edge_points(q, u, v, tau)
                rel = z.reshape(1, Q * M4, 3) - y_sg[:, None, :]
                n = jnp.linalg.norm(rel, axis=-1, keepdims=True)
                return (rel / jnp.maximum(n, 1e-9)).reshape(n_pix * Q * M4, 3)

            finish(z_sg, dz_sg, o3, valid, 1.0 / Me, quad_omega)

        # ---- sphere contours seen from each receiver ----------------------
        if ("sph_center" in params or "sph_radius" in params) and scene.num_spheres:
            Mp = cfg.samples_per_sphere
            phi = (jnp.arange(Mp, dtype=jnp.float32) + 0.5) * (2.0 * math.pi / Mp)
            c_sg = params_sg.get("sph_center", scene.sph_center)
            r_sg = params_sg.get("sph_radius", scene.sph_radius)

            def contours(eye):
                pts, valid_s = sphere_contour_points(c_sg, r_sg, eye, phi)
                return pts, valid_s  # (S, Mp, 3), (S,)

            pts, valid_s = jax.vmap(contours)(y_sg)  # (P, S, Mp, 3), (P, S)
            S = c_sg.shape[0]
            # d pts / d phi analytically (same circle algebra as boundary.py),
            # per receiver eye.
            zc = c_sg[None, :, :] - y_sg[:, None, :]
            dd = jnp.linalg.norm(zc, axis=-1)
            zh = zc / jnp.maximum(dd, 1e-6)[..., None]
            e1, e2 = _perp_basis(zh)
            r_abs = jnp.abs(r_sg)[None, :]
            rho_c = r_abs * jnp.sqrt(
                jnp.maximum(dd * dd - r_abs * r_abs, 1e-12)
            ) / jnp.maximum(dd, 1e-6)
            dphi = jnp.stack([-jnp.sin(phi), jnp.cos(phi)], axis=-1)  # (Mp, 2)
            dpts = rho_c[..., None, None] * (
                dphi[None, None, :, 0:1] * e1[:, :, None, :]
                + dphi[None, None, :, 1:2] * e2[:, :, None, :]
            )  # (P, S, Mp, 3)
            # Outward hint: the sphere surface normal at the contour point.
            n3d = pts - c_sg[None, :, None, :]
            # Dummy spheres (radius 0) are invalid via sphere_contour_points.
            valid = jnp.broadcast_to(valid_s[:, :, None], (n_pix, S, Mp))

            z_sg2 = pts.reshape(n_pix, S * Mp, 3)
            dz_sg2 = dpts.reshape(n_pix, S * Mp, 3)
            o32 = n3d.reshape(n_pix, S * Mp, 3)

            def sphere_omega(p):
                c = p.get("sph_center", scene.sph_center)
                r = p.get("sph_radius", scene.sph_radius)

                def one(eye):
                    z, _ = sphere_contour_points(c, r, eye, phi)
                    rel = z.reshape(S * Mp, 3) - eye[None, :]
                    n = jnp.linalg.norm(rel, axis=-1, keepdims=True)
                    return rel / jnp.maximum(n, 1e-9)

                return jax.vmap(one)(y_sg).reshape(n_pix * S * Mp, 3)

            finish(z_sg2, dz_sg2, o32, valid.reshape(n_pix, S * Mp),
                   2.0 * math.pi / Mp, sphere_omega)

        if not pieces:
            return zeros

        grads = zeros
        for omega_fn, w, n_sg in pieces:
            def scalar(p):
                om = omega_fn(p)
                return jnp.sum(w * jnp.sum(om * n_sg, axis=-1))

            grads = jax.tree_util.tree_map(
                jnp.add, grads, jax.grad(scalar)(params)
            )
        return grads

    @jax.custom_vjp
    def _shadow_image(params, cam, key_bits_f32):
        return jnp.zeros((height, width, 3), jnp.float32)

    def fwd(params, cam, key_bits_f32):
        return jnp.zeros((height, width, 3), jnp.float32), (params, cam, key_bits_f32)

    def bwd(res, ct):
        params, cam, key_bits_f32 = res
        key = jax.random.wrap_key_data(
            jax.lax.bitcast_convert_type(key_bits_f32, jnp.uint32)
        )
        grads = _shadow_cotangent(params, cam, key, ct)
        zero_cam = jax.tree_util.tree_map(jnp.zeros_like, cam)
        return grads, zero_cam, jnp.zeros_like(key_bits_f32)

    _shadow_image.defvjp(fwd, bwd)

    def shadow_image(params, cam: Camera, key):
        bits = jax.lax.bitcast_convert_type(
            jax.random.key_data(key), jnp.float32
        )
        return _shadow_image(params, cam, bits)

    return shadow_image
