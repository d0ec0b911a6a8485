"""Mirror-reflected silhouette gradients (round-5 VERDICT #4).

Method follows the round-3 shadow-edge quantification: build a scene where
finite differences measure a nonzero d(loss)/d(blocker) that is visible
ONLY in a flat metal reflection, show that interior + primary-boundary +
shadow-edge AD all miss it, then close the gap with the one-specular-bounce
edge estimator (diff/mirror_edge.py).
"""

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from raytracer_tpu.core.camera import make_camera
from raytracer_tpu.diff.boundary import make_boundary_image_fn
from raytracer_tpu.diff.grad import render_linear_diff, split_scene
from raytracer_tpu.diff.mirror_edge import (
    MirrorEdgeConfig,
    make_mirror_boundary_fn,
)
from raytracer_tpu.diff.shadow_edge import make_shadow_boundary_fn
from raytracer_tpu.geometry.scene import SceneBuilder

W = H = 48
SPP = 16
DEPTH = 4


def _mirror_scene(blocker_x: float = 0.6):
    """A flat metal mirror facing the camera; a dark blocker sphere BEHIND
    the camera, visible only as its reflection against the bright flat
    background reflected in the mirror."""
    b = SceneBuilder(0)
    mirror = b.metal((0.9, 0.9, 0.9), fuzz=0.0)
    b.add_quad((-2.0, -2.0, -3.0), (4, 0, 0), (0, 4, 0), mirror)
    b.add_sphere((blocker_x, 0.3, 1.6), 1.0, b.lambertian((0.05, 0.05, 0.05)))
    scene = b.build()
    cam, _ = make_camera(
        1.0, W, fov_degrees=60, look_from=(0, 0, 0), look_at=(0, 0, -3),
        background=(1.0, 1.0, 1.0),
    )
    return scene, cam


KW = dict(width=W, height=H, samples_per_pass=SPP, max_depth=DEPTH)


def _loss(scene, cam, key):
    img = render_linear_diff(scene, cam, key, **KW)
    return jnp.mean(img**2)


def test_mirror_silhouette_fd_vs_estimators():
    """Quantify, then close, the mirror-silhouette discontinuity (round-5
    VERDICT #4). The probe is the blocker RADIUS: growing the dark
    reflected disk changes mean(img^2), so FD measures a strong gradient
    (~-0.069 on this scene); a lateral blocker translation is the WRONG
    probe here — a dark disk moving over the uniform reflected background
    leaves the loss invariant, so FD is genuinely ~0 on that axis (and the
    estimator correctly reports ~0 there too, checked below).

    Measured on this config (CPU, 4 keys): FD -0.0687 +- 0.004; interior
    AD and interior+primary-boundary+shadow-edge AD: exactly 0.000 (the
    blocker is behind the camera: no primary silhouette, no shadow in
    view); interior+...+mirror-edge: -0.069 +- 0.003."""
    scene, cam = _mirror_scene()
    params, rebuild = split_scene(scene, ("sph_center", "sph_radius"))
    key = jax.random.PRNGKey(3)

    # ---- finite differences (common random numbers) on the radius ----
    h = 0.05
    f = []
    for dr in (-h, h):
        sc = rebuild(
            {**params, "sph_radius": params["sph_radius"].at[0].add(dr)}
        )
        f.append(float(_loss(sc, cam, key)))
    fd = (f[1] - f[0]) / (2 * h)
    assert abs(fd) > 0.03, f"scene produces no measurable FD signal: {fd}"

    # ---- interior + primary boundary + shadow edges: all blind ----
    boundary_fn = make_boundary_image_fn(
        rebuild, width=W, height=H, max_depth=DEPTH
    )
    shadow_fn = make_shadow_boundary_fn(
        rebuild, width=W, height=H, max_depth=DEPTH
    )
    mirror_fn = make_mirror_boundary_fn(
        rebuild, width=W, height=H, max_depth=DEPTH,
        config=MirrorEdgeConfig(samples_per_contour=256, spp_edge=16),
    )

    def loss_with(p, key, use):
        img = render_linear_diff(rebuild(p), cam, key, **KW)
        k1, k2, k3 = jax.random.split(key, 3)
        if "b" in use:
            img = img + boundary_fn(p, cam, k1)
        if "s" in use:
            img = img + shadow_fn(p, cam, k2)
        if "m" in use:
            img = img + mirror_fn(p, cam, k3)
        return jnp.mean(img**2)

    g_int = jax.grad(partial(loss_with, key=key, use=""))(params)
    g_bs = jax.grad(partial(loss_with, key=key, use="bs"))(params)
    g_all = jax.grad(partial(loss_with, key=key, use="bsm"))(params)

    blind_int = float(g_int["sph_radius"][0])
    blind_bs = float(g_bs["sph_radius"][0])
    with_mirror = float(g_all["sph_radius"][0])

    # Every mirror-blind estimator misses essentially all of the gradient.
    assert abs(blind_int) < 0.1 * abs(fd), (blind_int, fd)
    assert abs(blind_bs) < 0.1 * abs(fd), (blind_bs, fd)
    # The mirror term recovers it (edge sampling is Monte Carlo: allow a
    # meaningful envelope; measured within a few percent of FD).
    assert np.sign(with_mirror) == np.sign(fd), (with_mirror, fd)
    assert 0.6 * abs(fd) < abs(with_mirror) < 1.5 * abs(fd), (
        with_mirror,
        fd,
    )
    # And the translation axis: FD ~ 0 by symmetry, and the estimator does
    # NOT hallucinate a gradient there (|d/dcx| << |d/dr|).
    assert abs(float(g_all["sph_center"][0, 0])) < 0.25 * abs(fd)


def test_mirror_edge_masks_non_mirrors():
    """Fuzzy metal and lambertian quads are not mirrors: the estimator
    contributes exactly zero for them."""
    for make_mat in ("fuzzy", "lambert"):
        b = SceneBuilder(0)
        if make_mat == "fuzzy":
            m = b.metal((0.9, 0.9, 0.9), fuzz=0.3)
        else:
            m = b.lambertian((0.9, 0.9, 0.9))
        b.add_quad((-2.0, -2.0, -3.0), (4, 0, 0), (0, 4, 0), m)
        b.add_sphere((0.5, 0.3, 1.5), 0.5, b.lambertian((0.05, 0.05, 0.05)))
        scene = b.build()
        cam, _ = make_camera(
            1.0, W, fov_degrees=60, look_from=(0, 0, 0), look_at=(0, 0, -3),
            background=(1.0, 1.0, 1.0),
        )
        params, rebuild = split_scene(scene, ("sph_center",))
        mirror_fn = make_mirror_boundary_fn(
            rebuild, width=W, height=H, max_depth=DEPTH,
            config=MirrorEdgeConfig(samples_per_contour=32, spp_edge=2),
        )

        def only_mirror(p):
            img = mirror_fn(p, cam, jax.random.PRNGKey(0))
            return jnp.mean(img**2) + jnp.sum(img)

        g = jax.grad(only_mirror)(params)
        np.testing.assert_array_equal(np.asarray(g["sph_center"]), 0.0)


def test_mirror_edge_behind_mirror_masked():
    """A sphere BEHIND the mirror plane (seen directly through no mirror)
    gets no mirror-edge contribution."""
    b = SceneBuilder(0)
    b.add_quad(
        (-2.0, -2.0, -3.0), (4, 0, 0), (0, 4, 0), b.metal((0.9, 0.9, 0.9))
    )
    b.add_sphere((0.0, 0.0, -5.0), 0.5, b.lambertian((0.1, 0.1, 0.1)))
    scene = b.build()
    cam, _ = make_camera(
        1.0, W, fov_degrees=60, look_from=(0, 0, 0), look_at=(0, 0, -3),
        background=(1.0, 1.0, 1.0),
    )
    params, rebuild = split_scene(scene, ("sph_center",))
    mirror_fn = make_mirror_boundary_fn(
        rebuild, width=W, height=H, max_depth=DEPTH,
        config=MirrorEdgeConfig(samples_per_contour=32, spp_edge=2),
    )

    g = jax.grad(
        lambda p: jnp.sum(mirror_fn(p, cam, jax.random.PRNGKey(0)))
    )(params)
    np.testing.assert_array_equal(np.asarray(g["sph_center"]), 0.0)
