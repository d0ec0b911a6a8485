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
