"""Refracted-silhouette gradients through glass spheres (round 5):
specular-manifold edge sampling CLOSES the gap tests/test_glass_gap.py
quantifies — the last open discontinuity class.

Measured on the glass-gap scene (CPU, 48x48@32spp depth 6): FD
d(loss)/d(quad_u.x) = -0.062 +- 0.003; interior AD and
interior+primary-boundary AD report exactly 0.000 (test_glass_gap.py);
with the refracted-edge term: -0.0595 +- 0.001 — within ~3% of FD.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from raytracer_tpu.diff.grad import render_linear_diff, split_scene
from raytracer_tpu.diff.refracted_edge import (
    RefractedEdgeConfig,
    make_refracted_boundary_fn,
)
from test_glass_gap import KW, W, H, _glass_scene


def test_refracted_edge_recovers_fd():
    scene, cam = _glass_scene()
    params, rebuild = split_scene(scene, ("quad_q", "quad_u"))

    def loss(p, key):
        img = render_linear_diff(rebuild(p), cam, key, **KW)
        return jnp.mean(img**2)

    # FD (common random numbers) on the size axis.
    h = 0.04
    fds = []
    for k in range(4):
        key = jax.random.PRNGKey(k)
        f = [
            float(loss(
                {**params, "quad_u": params["quad_u"].at[0, 0].add(dx)}, key
            ))
            for dx in (-h, h)
        ]
        fds.append((f[1] - f[0]) / (2 * h))
    fd = float(np.mean(fds))
    assert fd < -0.03, (fd, fds)

    rfn = make_refracted_boundary_fn(
        rebuild, width=W, height=H, max_depth=KW["max_depth"],
        config=RefractedEdgeConfig(samples_per_quad_edge=64, spp_edge=16),
    )

    def loss_r(p, key):
        img = render_linear_diff(rebuild(p), cam, key, **KW)
        img = img + rfn(p, cam, jax.random.fold_in(key, 7))
        return jnp.mean(img**2)

    grads = [
        jax.grad(partial(loss_r, key=jax.random.PRNGKey(k)))(params)
        for k in range(3)
    ]
    ad = float(np.mean([float(g["quad_u"][0, 0]) for g in grads]))
    assert np.sign(ad) == np.sign(fd), (ad, fd)
    assert 0.7 * abs(fd) < abs(ad) < 1.4 * abs(fd), (ad, fd)
    # Translation along the plane: near-zero by symmetry (the dark patch
    # slides under a uniform background) — the estimator must not
    # hallucinate a gradient there.
    ad_q = float(np.mean([float(g["quad_q"][0, 0]) for g in grads]))
    assert abs(ad_q) < 0.15 * abs(fd), (ad_q, fd)


def test_refracted_edge_no_glass_is_zero():
    """Without a dielectric sphere in the scene the estimator contributes
    exactly zero (every root is masked by the glass gate)."""
    from raytracer_tpu.core.camera import make_camera
    from raytracer_tpu.geometry.scene import SceneBuilder

    b = SceneBuilder(0)
    b.add_sphere((0, 0, -2.0), 0.8, b.lambertian((0.5, 0.5, 0.5)))
    b.add_quad((-0.5, -0.5, -4.0), (1.0, 0, 0), (0, 1.0, 0),
               b.lambertian((0.05, 0.05, 0.05)))
    scene = b.build()
    cam, _ = make_camera(1.0, W, fov_degrees=40, look_from=(0, 0, 1),
                         look_at=(0, 0, -2), background=(1.0, 1.0, 1.0))
    params, rebuild = split_scene(scene, ("quad_u",))
    rfn = make_refracted_boundary_fn(
        rebuild, width=W, height=H, max_depth=4,
        config=RefractedEdgeConfig(samples_per_quad_edge=8, spp_edge=2),
    )
    g = jax.grad(
        lambda p: jnp.sum(rfn(p, cam, jax.random.PRNGKey(0)))
    )(params)
    np.testing.assert_array_equal(np.asarray(g["quad_u"]), 0.0)
