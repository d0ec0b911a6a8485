"""NumPy oracle: a direct scalar port of the reference's math, used as ground
truth in tests (SURVEY.md §4: the reference itself has no tests; its formulas,
cited by file:line below, are the spec).

This is intentionally a *naive, scalar, branchy* implementation — the opposite
of the TPU design — so that agreement between the two is meaningful.
"""

from __future__ import annotations

import math

import numpy as np

F = np.float32


# ---- camera (camera.go:128-178, 265-299) ----------------------------------
class OracleCamera:
    def __init__(
        self,
        aspect,
        width,
        fov_degrees=90.0,
        look_from=(0, 0, -1),
        look_at=(0, 0, 0),
        vup=(0, 1, 0),
        defocus_angle_degrees=0.0,
        focus_dist=10.0,
    ):
        look_from = np.array(look_from, F)
        look_at = np.array(look_at, F)
        vup = np.array(vup, F)
        fov = math.radians(fov_degrees)
        self.center = look_from

        h = math.tan(fov / 2.0)
        self.image_width = float(width)
        image_height = math.floor(width) / aspect
        self.image_height = max(1.0, image_height)
        viewport_h = 2.0 * h * focus_dist
        viewport_w = viewport_h * (self.image_width / self.image_height)

        w = look_from - look_at
        w = w / np.linalg.norm(w)
        u = np.cross(vup, w)
        u = u / np.linalg.norm(u)
        v = np.cross(w, u)

        viewport_u = u * viewport_w
        viewport_v = -v * viewport_h
        self.pixel_du = viewport_u / self.image_width
        self.pixel_dv = viewport_v / self.image_height
        upper_left = (
            self.center - focus_dist * w - 0.5 * viewport_u - 0.5 * viewport_v
        )
        self.pixel00 = upper_left + 0.5 * (self.pixel_du + self.pixel_dv)
        defocus_radius = focus_dist * math.tan(math.radians(defocus_angle_degrees) / 2)
        self.defocus_disk_u = u * defocus_radius
        self.defocus_disk_v = v * defocus_radius
        self.defocus = defocus_angle_degrees > 0

    def ray(self, i, j, dx=0.0, dy=0.0, disk_xy=(0.0, 0.0)):
        """GetRay (camera.go:265-299) with explicit jitter/disk samples."""
        pixel_center = (
            self.pixel00
            + (i + dx) * self.pixel_du
            + (j + dy) * self.pixel_dv
        )
        origin = self.center
        if self.defocus:
            origin = (
                self.center
                + disk_xy[0] * self.defocus_disk_u
                + disk_xy[1] * self.defocus_disk_v
            )
        return origin.astype(F), (pixel_center - origin).astype(F)


# ---- sphere hit (hittables.go:96-132) --------------------------------------
def sphere_hit(origin, direction, center, radius, t_min, t_max):
    """Returns (t, point, outward_normal, u, v, front_face) or None."""
    origin = np.asarray(origin, F)
    direction = np.asarray(direction, F)
    center = np.asarray(center, F)
    oc = origin - center
    a = float(direction @ direction)
    half_b = float(direction @ oc)
    c = float(oc @ oc) - radius * radius
    disc = half_b * half_b - a * c
    if disc < 0:
        return None
    sq = math.sqrt(disc)
    t = (-half_b - sq) / a
    if not (t_min < t < t_max):
        t = (-half_b + sq) / a
        if not (t_min < t < t_max):
            return None
    point = origin + t * direction
    norm = (point - center) * radius
    norm = norm / np.linalg.norm(norm)
    theta = math.acos(-float(norm[1]))
    phi = math.atan2(-float(norm[2]), float(norm[0])) + math.pi
    u = (phi + 5 * math.pi / 12) / (2 * math.pi)
    v = theta / math.pi
    front = float(direction @ norm) < 0
    out = norm if front else -norm
    return t, point, out, u, v, front


# ---- quad hit (hittables.go:149-194) ---------------------------------------
def quad_hit(origin, direction, q, uvec, vvec, t_min, t_max):
    origin = np.asarray(origin, F)
    direction = np.asarray(direction, F)
    q = np.asarray(q, F)
    uvec = np.asarray(uvec, F)
    vvec = np.asarray(vvec, F)
    n = np.cross(uvec, vvec)
    normal = n / np.linalg.norm(n)
    d = float(normal @ q)
    w = n / float(n @ n)
    denom = float(direction @ normal)
    if abs(denom) < 1e-8:
        return None
    t = (d - float(normal @ origin)) / denom
    if not (t_min < t < t_max):
        return None
    p = origin + t * direction
    hp = p - q
    alpha = float(w @ np.cross(hp, vvec))
    beta = float(w @ np.cross(uvec, hp))
    if alpha < 0 or alpha > 1 or beta < 0 or beta > 1:
        return None
    front = denom < 0
    out = normal if front else -normal
    return t, p, out, alpha, beta, front


def closest_hit(origin, direction, spheres, quads, t_min=1e-3):
    """World.Hit's shrinking linear scan (hittables.go:55-72).

    spheres: list of (center, radius, mat_id); quads: list of (q, u, v, mat_id).
    Returns (t, point, normal, u, v, front, mat_id, prim_index) or None.
    Primitive indexing matches the Scene tables: spheres first, then quads.
    """
    best = None
    t_max = float("inf")
    for k, (c, r, m) in enumerate(spheres):
        h = sphere_hit(origin, direction, c, r, t_min, t_max)
        if h is not None:
            t_max = h[0]
            best = (*h[:6], m, k)
    for k, (q, u, v, m) in enumerate(quads):
        h = quad_hit(origin, direction, q, u, v, t_min, t_max)
        if h is not None:
            t_max = h[0]
            best = (*h[:6], m, len(spheres) + k)
    return best


def make_fast_hit(S: "OracleScene"):
    """Vectorized-over-primitives closest hit, exactly equal to `closest_hit`.

    Equivalence argument (why the argmin may ignore the reference's shrinking
    t_max, hittables.go:55-72): shrinking t_max can only REJECT a primitive's
    candidate (a sphere's near root above t_max falls through to the even
    larger far root, which is also above it — hittables.go:110-116 never
    *switches* to a different valid t as t_max shrinks). The global-minimum
    candidate survives every shrink, so argmin over per-primitive candidates
    computed at t_max = +inf returns the same winner; exact ties keep the
    first primitive in table order, matching the scan's strict `t < t_max`.
    The winner's full record is then recomputed by the SCALAR sphere_hit /
    quad_hit so every formula lives in one place. Per-step dtypes mirror the
    scalar code (f32 dots widened to f64 arithmetic) so candidate t values
    are bit-identical; `test_oracle_image.py` pins fast == scalar per ray.

    Used only to make the converged full-image oracle render tractable
    (~250x on the 487-sphere scene); the per-ray branchy loop in get_color
    stays scalar.
    """
    D = np.float64
    if S.spheres:
        sc = np.stack([c for c, _, _ in S.spheres]).astype(F)  # (S,3)
        sr = np.array([r for _, r, _ in S.spheres], D)  # radius as f64 (scalar code uses Python float)
    else:
        sc = np.zeros((0, 3), F)
        sr = np.zeros((0,), D)
    if S.quads:
        qq = np.stack([q for q, _, _, _ in S.quads]).astype(F)
        qu = np.stack([u for _, u, _, _ in S.quads]).astype(F)
        qv = np.stack([v for _, _, v, _ in S.quads]).astype(F)
    else:
        qq = np.zeros((0, 3), F)
        qu = np.zeros((0, 3), F)
        qv = np.zeros((0, 3), F)
    # Quad plane precompute, mirroring quad_hit's scalar dtype chain.
    qn = np.cross(qu, qv).astype(F)  # (Q,3) f32
    qnorm = qn / np.linalg.norm(qn, axis=1, keepdims=True)  # f32, NaN for dummy
    qd = np.einsum("qi,qi->q", qnorm, qq).astype(F).astype(D)
    qw = qn / np.einsum("qi,qi->q", qn, qn).astype(F)[:, None]

    ns = sc.shape[0]

    def fast_hit(origin, direction, t_min=1e-3):
        o = np.asarray(origin, F)
        d = np.asarray(direction, F)
        best_t = np.inf
        best = None  # (kind, index)
        if ns:
            oc = (o[None, :] - sc).astype(F)  # f32 like scalar
            a = D((d @ d).astype(F))
            half_b = np.einsum("si,i->s", oc, d).astype(F).astype(D)
            c = np.einsum("si,si->s", oc, oc).astype(F).astype(D) - sr * sr
            disc = half_b * half_b - a * c
            ok = disc >= 0
            sq = np.sqrt(np.where(ok, disc, 0.0))
            t_near = (-half_b - sq) / a
            t_far = (-half_b + sq) / a
            t = np.where(t_near > t_min, t_near, t_far)
            t = np.where(ok & (t > t_min), t, np.inf)
            k = int(np.argmin(t))
            if t[k] < best_t:
                best_t = float(t[k])
                best = ("s", k)
        if qq.shape[0]:
            denom = np.einsum("qi,i->q", qnorm, d).astype(F).astype(D)
            with np.errstate(invalid="ignore", divide="ignore"):
                t = (qd - np.einsum("qi,i->q", qnorm, o).astype(F).astype(D)) / denom
                valid = (np.abs(denom) >= 1e-8) & (t > t_min)
                # p/hp/alpha/beta stay float64, mirroring quad_hit's scalar
                # chain (f32 vectors, Python-float t, f64 products).
                p = o[None, :] + t[:, None] * d[None, :].astype(D)
                hp = p - qq
                alpha = np.einsum("qi,qi->q", qw.astype(D), np.cross(hp, qv.astype(D)))
                beta = np.einsum("qi,qi->q", qw.astype(D), np.cross(qu.astype(D), hp))
            valid &= (alpha >= 0) & (alpha <= 1) & (beta >= 0) & (beta <= 1)
            t = np.where(valid, t, np.inf)
            k = int(np.argmin(t))
            if t[k] < best_t:
                best_t = float(t[k])
                best = ("q", k)
        if best is None:
            return None
        kind, k = best
        if kind == "s":
            c0, r0, m = S.spheres[k]
            h = sphere_hit(o, d, c0, r0, t_min, float("inf"))
            if h is None:
                # Knife edge: einsum's f32 accumulation order differs from
                # np.dot by <=1 ulp, which can flip a grazing discriminant's
                # sign. Authoritative answer = the full scalar scan (rare:
                # zero in 2304 primary rays, a handful per million bounces).
                return closest_hit(o, d, S.spheres, S.quads, t_min=t_min)
            return (*h[:6], m, k)
        q0, u0, v0, m = S.quads[k]
        h = quad_hit(o, d, q0, u0, v0, t_min, float("inf"))
        if h is None:
            return closest_hit(o, d, S.spheres, S.quads, t_min=t_min)
        return (*h[:6], m, ns + k)

    return fast_hit


# ---- optics (vec3.go:212-221, materials.go:115-119) ------------------------
def reflect(v, n):
    return v - 2 * float(v @ n) * n


def refract(uv, n, eta_ratio):
    cos_theta = float(-uv @ n)
    perp = eta_ratio * (uv + cos_theta * n)
    par = -math.sqrt(abs(1.0 - float(perp @ perp))) * n
    return perp + par


def schlick(cos_theta, eta_ratio):
    r0 = (1 - eta_ratio) / (1 + eta_ratio)
    r0 *= r0
    return r0 + (1 - r0) * (1 - cos_theta) ** 5


# ---- perlin (materials.go:218-262) -----------------------------------------
def perlin_noise(vec, px, py, pz, p):
    x, y, z = float(p[0]), float(p[1]), float(p[2])
    xi, yi, zi = math.floor(x), math.floor(y), math.floor(z)
    tx, ty, tz = x - xi, y - yi, z - zi

    def smooth(t):
        return t * t * (3 - 2 * t)

    fx, fy, fz = smooth(tx), smooth(ty), smooth(tz)
    acc = 0.0
    for di in (0, 1):
        for dj in (0, 1):
            for dk in (0, 1):
                idx = (
                    px[(xi + di) & 255]
                    ^ py[(yi + dj) & 255]
                    ^ pz[(zi + dk) & 255]
                )
                g = vec[idx]
                off = np.array([tx - di, ty - dj, tz - dk], F)
                wi = fx if di else (1 - fx)
                wj = fy if dj else (1 - fy)
                wk = fz if dk else (1 - fz)
                acc += wi * wj * wk * float(g @ off)
    return acc


def perlin_turb(vec, px, py, pz, p, depth=7):
    acc = 0.0
    weight = 1.0
    pp = np.array(p, F)
    for _ in range(depth):
        acc += weight * perlin_noise(vec, px, py, pz, pp)
        weight *= 0.5
        pp = pp * 2
    return abs(acc)


# ---- end-to-end integrator oracle (ray.go:32-54) ----------------------------
#
# A scalar, recursive-in-spirit port of Ray.GetColor with every stochastic
# decision injected as an explicit uniform, so it can be compared per ray
# against the wavefront trace() (which accepts the same uniforms via
# `uniform_seq`). This is the one reference routine with no other full oracle
# (VERDICT round 1, Missing #2).

TEX_SOLID, TEX_CHECKER, TEX_IMAGE, TEX_NOISE = 0, 1, 2, 3
LAMBERTIAN, METAL, DIELECTRIC, DIFFUSE_LIGHT = 0, 1, 2, 3


class OracleScene:
    """NumPy view of a raytracer_tpu Scene pytree for the scalar integrator."""

    def __init__(self, scene):
        g = lambda a: np.asarray(a)
        self.spheres = [
            (g(scene.sph_center)[i], float(g(scene.sph_radius)[i]), int(g(scene.sph_mat)[i]))
            for i in range(g(scene.sph_center).shape[0])
            if float(g(scene.sph_radius)[i]) != 0.0  # dummy rows (scene.py)
        ]
        self.quads = [
            (g(scene.quad_q)[i], g(scene.quad_u)[i], g(scene.quad_v)[i], int(g(scene.quad_mat)[i]))
            for i in range(g(scene.quad_q).shape[0])
            if np.linalg.norm(np.cross(g(scene.quad_u)[i], g(scene.quad_v)[i])) > 0
        ]
        self.mat_type = g(scene.mat_type)
        self.mat_albedo = g(scene.mat_albedo)
        self.mat_fuzz = g(scene.mat_fuzz)
        self.mat_ior = g(scene.mat_ior)
        self.mat_tex = g(scene.mat_tex)
        self.tex_type = g(scene.tex_type)
        self.tex_c0 = g(scene.tex_c0)
        self.tex_c1 = g(scene.tex_c1)
        self.tex_scale = g(scene.tex_scale)
        self.tex_image = g(scene.tex_image)
        self.images = g(scene.images)
        self.image_dims = g(scene.image_dims)
        self.perlin_vec = g(scene.perlin_vec)
        self.perlin_px = g(scene.perlin_px)
        self.perlin_py = g(scene.perlin_py)
        self.perlin_pz = g(scene.perlin_pz)


def eval_texture(S: OracleScene, tex_id, u, v, point):
    """Texture.GetTexture dispatch (materials.go:121-295)."""
    tt = int(S.tex_type[tex_id])
    if tt == TEX_CHECKER:
        # materials.go:127-137: parity of summed floor(point / scale).
        inv = 1.0 / float(S.tex_scale[tex_id])
        ip = np.floor(inv * point).astype(np.int64)
        return S.tex_c0[tex_id] if (ip[0] + ip[1] + ip[2]) % 2 == 0 else S.tex_c1[tex_id]
    if tt == TEX_IMAGE:
        # materials.go:176-193: clamp u, flip v, truncate (NN); indices
        # clamped into range like textures._image_lookup.
        img = int(S.tex_image[tex_id])
        h, w = int(S.image_dims[img, 0]), int(S.image_dims[img, 1])
        uu = min(max(float(u), 0.0), 1.0)
        vv = 1.0 - min(max(float(v), 0.0), 1.0)
        i = min(max(int(uu * w), 0), w - 1)
        j = min(max(int(vv * h), 0), h - 1)
        return S.images[img, j, i]
    if tt == TEX_NOISE:
        # materials.go:285-288: marble.
        sp = point * float(S.tex_scale[tex_id])
        turb = perlin_turb(S.perlin_vec, S.perlin_px, S.perlin_py, S.perlin_pz, sp)
        val = 0.5 * (1.0 + math.sin(float(sp[2]) + 10.0 * turb))
        return np.array([val, val, val], F)
    return S.tex_c0[tex_id]  # solid (materials.go:157-159)


def _unit_sphere_sample(u0, u1):
    """core.sampling.unit_sphere_from_uniform (Archimedes map)."""
    z = 1.0 - 2.0 * u0
    phi = 2.0 * math.pi * u1
    r = math.sqrt(max(0.0, 1.0 - z * z))
    return np.array([r * math.cos(phi), r * math.sin(phi), z], F)


def _sky(direction):
    unit = direction / math.sqrt(float(direction @ direction) + 1e-20)
    a = 0.5 * (float(unit[1]) + 1.0)
    return (1.0 - a) * np.ones(3, F) + a * np.array([0.5, 0.7, 1.0], F)


def get_color(
    S: OracleScene,
    origin,
    direction,
    max_depth,
    uniforms,
    background,
    sky_gradient=False,
    hit_fn=None,
):
    """Ray.GetColor (ray.go:32-54), iterative with injected uniforms.

    uniforms: (max_depth, 3) — row b is consumed at bounce b exactly as the
    wavefront consumes `uniform_seq[b]` ([0:2] unit-sphere sample, [2] the
    dielectric reflect/refract coin).
    hit_fn: optional (origin, direction) -> closest-hit tuple; defaults to
    the scalar shrinking scan (pass make_fast_hit(S) for big scenes — pinned
    exactly equal in test_oracle_image.py).
    Returns the path radiance (3,).
    """
    o = np.array(origin, F)
    d = np.array(direction, F)
    throughput = np.ones(3, F)
    radiance = np.zeros(3, F)
    background = np.asarray(background, F)

    for b in range(max_depth):
        h = (
            hit_fn(o, d)
            if hit_fn is not None
            else closest_hit(o, d, S.spheres, S.quads, t_min=1e-3)
        )
        if h is None:
            # Miss -> background (ray.go:51-53).
            bg = _sky(d) if sky_gradient else background
            return radiance + throughput * bg
        t, p, n, u, v, front, mat, prim = h
        u0, u1, u2 = (float(x) for x in uniforms[b])

        mtype = int(S.mat_type[mat])
        tex = int(S.mat_tex[mat])
        if mtype == DIFFUSE_LIGHT:
            # Emit, never scatter (materials.go:297-313; ray.go:44-46).
            return radiance + throughput * eval_texture(S, tex, u, v, p)

        ss = _unit_sphere_sample(u0, u1)
        unit_d = d / math.sqrt(float(d @ d) + 1e-20)

        if mtype == LAMBERTIAN:
            new_d = n + ss
            if np.all(np.abs(new_d) < 1e-8):  # vec3.go:170-172 guard
                new_d = n
            att = eval_texture(S, tex, u, v, p)
        elif mtype == METAL:
            refl = reflect(unit_d, n)
            new_d = refl + float(S.mat_fuzz[mat]) * ss
            if float(new_d @ n) <= 0.0:  # absorbed (materials.go:73-74)
                return radiance
            att = S.mat_albedo[mat]
        else:  # DIELECTRIC (materials.go:91-113)
            ior = float(S.mat_ior[mat])
            eta = (1.0 / ior) if front else ior
            cos_t = min(float(-unit_d @ n), 1.0)
            sin_t = math.sqrt(min(max(1.0 - cos_t * cos_t, 1e-12), 1.0))
            cannot = sin_t * eta > 1.0
            if cannot or schlick(cos_t, eta) > u2:
                new_d = reflect(unit_d, n)
            else:
                new_d = refract(unit_d, n, eta)
            att = np.ones(3, F)

        throughput = throughput * att
        o, d = p.astype(F), np.asarray(new_d, F)
    return radiance  # depth exhausted -> black tail (ray.go:33-35)
