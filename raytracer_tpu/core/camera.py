"""Pinhole + thin-lens camera as a pure function of a parameter pytree.

Replaces the reference's stateful Camera struct + worker pool
(/root/reference/internal/camera.go:23-178, 265-299). All derived state
(basis, viewport, pixel deltas, defocus disk) is recomputed inside jit from the
raw parameters — it is a handful of scalar ops, XLA folds it, and it makes
every camera parameter differentiable for free (SURVEY.md §3.4).

Layout convention: pixel (i, j) = (column, row), row 0 at the top, matching
the reference's scan order (camera.go:202-204).
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax.numpy as jnp

from raytracer_tpu.core import vecmath as vm
from raytracer_tpu.core.sampling import unit_disk_from_uniform


class Camera(NamedTuple):
    """Differentiable camera parameters (all float32 array leaves).

    Defaults mirror camera.go:104-117: fov=90deg, focus_dist=10, defocus=0,
    look_from=(0,0,-1), look_at=origin, vup=(0,1,0), background=black.
    """

    look_from: jnp.ndarray  # (3,)
    look_at: jnp.ndarray  # (3,)
    vup: jnp.ndarray  # (3,)
    fov_radians: jnp.ndarray  # ()
    defocus_angle_radians: jnp.ndarray  # ()
    focus_dist: jnp.ndarray  # ()
    background: jnp.ndarray  # (3,) flat background color (ray.go:53)
    # () — W/H aspect. The reference sizes the viewport and pixel pitch from
    # the FLOAT image height floor(W)/aspect (camera.go:137-153) while
    # rendering int(height) rows; carrying the aspect keeps that exact even
    # when W/aspect is not an integer (the int height alone cannot).
    aspect: jnp.ndarray = None


class RenderSettings(NamedTuple):
    """Static (non-traced) render configuration.

    Mirrors the reference's compile-time/config constants: image size
    (camera.go:104-126), samples per pixel (camera.go:56-60), bounce depth
    (camera.go:62-66). `sky_gradient` enables the book-canonical lerp sky
    instead of the flat background color (BASELINE.md configs; the reference
    itself only has the flat color, ray.go:53).
    """

    width: int
    height: int
    samples_per_pixel: int = 100
    max_depth: int = 50
    sky_gradient: bool = False


def image_height_for(aspect_ratio: float, image_width: int) -> int:
    """Integer image height. Reference: camera.go:137-140 computes the float
    height `floor(W)/aspect` clamped to >= 1; the render loop truncates to int
    (camera.go:181-182)."""
    h = math.floor(float(image_width)) / float(aspect_ratio)
    return max(1, int(h))


def make_camera(
    aspect_ratio: float,
    image_width: int,
    *,
    samples_per_pixel: int = 100,
    max_depth: int = 50,
    fov_degrees: float = 90.0,
    look_from=(0.0, 0.0, -1.0),
    look_at=(0.0, 0.0, 0.0),
    vup=(0.0, 1.0, 0.0),
    defocus_angle_degrees: float = 0.0,
    focus_dist: float = 10.0,
    background=(0.0, 0.0, 0.0),
    sky_gradient: bool = False,
) -> tuple[Camera, RenderSettings]:
    """Build (Camera pytree, static RenderSettings).

    Functional-options equivalent of NewCamera (camera.go:104-126).
    """
    cam = Camera(
        look_from=jnp.asarray(look_from, jnp.float32),
        look_at=jnp.asarray(look_at, jnp.float32),
        vup=jnp.asarray(vup, jnp.float32),
        fov_radians=jnp.float32(math.radians(fov_degrees)),
        defocus_angle_radians=jnp.float32(math.radians(defocus_angle_degrees)),
        focus_dist=jnp.float32(focus_dist),
        background=jnp.asarray(background, jnp.float32),
        aspect=jnp.float32(aspect_ratio),
    )
    settings = RenderSettings(
        width=int(image_width),
        height=image_height_for(aspect_ratio, image_width),
        samples_per_pixel=samples_per_pixel,
        max_depth=max_depth,
        sky_gradient=sky_gradient,
    )
    return cam, settings


class CameraFrame(NamedTuple):
    """Derived camera state (camera.go:128-165), recomputed inside jit."""

    center: jnp.ndarray  # (3,)
    pixel00: jnp.ndarray  # (3,)
    pixel_du: jnp.ndarray  # (3,)
    pixel_dv: jnp.ndarray  # (3,)
    defocus_disk_u: jnp.ndarray  # (3,)
    defocus_disk_v: jnp.ndarray  # (3,)
    defocus_angle_radians: jnp.ndarray  # ()


def camera_frame(cam: Camera, width: int, height: int) -> CameraFrame:
    """Compute the derived frame. Mirrors Camera.init (camera.go:128-165).

    The reference uses the *float* image height `floor(W)/aspect` for the
    viewport width and pixel_dv scale (camera.go:137-153) even though it
    renders int(height) rows; when the camera carries its aspect we do the
    same, so non-dividing aspects (e.g. aspect=3, W=100 -> H=33 rows at a
    33.33-row pitch) match the reference bit-for-bit. Cameras without an
    aspect (None) fall back to the integer height (identical whenever
    W/aspect is an integer — every reference scene).
    """
    center = cam.look_from
    w = vm.normalize(cam.look_from - cam.look_at)
    u = vm.normalize(jnp.cross(cam.vup, w))
    v = jnp.cross(w, u)

    h = jnp.tan(cam.fov_radians / 2.0)
    viewport_h = 2.0 * h * cam.focus_dist
    if getattr(cam, "aspect", None) is not None:
        float_h = jnp.maximum(float(width) / cam.aspect, 1.0)  # camera.go:137-140
    else:
        float_h = float(height)
    viewport_w = viewport_h * (float(width) / float_h)

    viewport_u = u * viewport_w
    viewport_v = -v * viewport_h
    pixel_du = viewport_u / float(width)
    pixel_dv = viewport_v / float_h

    upper_left = center - cam.focus_dist * w - 0.5 * viewport_u - 0.5 * viewport_v
    pixel00 = upper_left + 0.5 * (pixel_du + pixel_dv)

    defocus_radius = cam.focus_dist * jnp.tan(cam.defocus_angle_radians / 2.0)
    return CameraFrame(
        center=center,
        pixel00=pixel00,
        pixel_du=pixel_du,
        pixel_dv=pixel_dv,
        defocus_disk_u=u * defocus_radius,
        defocus_disk_v=v * defocus_radius,
        defocus_angle_radians=cam.defocus_angle_radians,
    )


def camera_rays(frame: CameraFrame, px, py, uniforms):
    """Generate one primary ray per lane.

    Args:
      frame: CameraFrame.
      px, py: (N,) int or float pixel coordinates (column, row).
      uniforms: (N, 4) U[0,1) — [dx, dy] pixel jitter + 2 for the defocus disk.

    Returns:
      (origin (N,3), direction (N,3)); direction is *unnormalized*, matching
      the reference (camera.go:283-286) so t-parameter semantics line up.

    Mirrors GetRay + sampleUnitSquare (camera.go:265-299).
    """
    px = px.astype(jnp.float32)
    py = py.astype(jnp.float32)
    dx = uniforms[..., 0] - 0.5
    dy = uniforms[..., 1] - 0.5
    pixel_center = (
        frame.pixel00
        + (px + dx)[..., None] * frame.pixel_du
        + (py + dy)[..., None] * frame.pixel_dv
    )
    disk = unit_disk_from_uniform(uniforms[..., 2:4])
    lens_origin = (
        frame.center
        + disk[..., 0:1] * frame.defocus_disk_u
        + disk[..., 1:2] * frame.defocus_disk_v
    )
    origin = jnp.where(frame.defocus_angle_radians > 0.0, lens_origin,
                       jnp.broadcast_to(frame.center, lens_origin.shape))
    direction = pixel_center - origin
    return origin, direction
