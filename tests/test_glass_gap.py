"""Refracted-silhouette gradient gap: QUANTIFIED documented limit.

Round-5 extension of the discontinuity ledger (diff/grad.py "Known
limits"): a blocker seen only THROUGH a glass sphere contributes a
gradient via its refracted image's edges, which interior AD and primary
boundary sampling cannot see. This test pins the measured SIZE of that
gap (what the blind estimators miss); diff/refracted_edge.py CLOSES it
with a specular-manifold Newton solve — tests/test_refracted_edge.py
asserts the recovery on the same scene.

Measured here (CPU, 48x48@32spp depth 6, 4 keys): FD d(loss)/d(quad_u.x)
= -0.062 +- 0.003 for a dark quad fully hidden behind a glass sphere
(stretching the quad grows its dark refracted image); interior AD and
interior + primary-boundary AD both report exactly 0.000 — the direct
silhouette is occluded (its edge-sampled in/out pairs cancel under common
random numbers, the correct behavior pinned by
test_boundary_grad.test_occluded_silhouette_cancels), and the refracted
edge is invisible to every estimator.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from raytracer_tpu.core.camera import make_camera
from raytracer_tpu.diff.boundary import make_boundary_image_fn
from raytracer_tpu.diff.grad import render_linear_diff, split_scene
from raytracer_tpu.geometry.scene import SceneBuilder

W = H = 48
KW = dict(width=W, height=H, samples_per_pass=32, max_depth=6)


def _glass_scene():
    b = SceneBuilder(0)
    b.add_sphere((0, 0, -2.0), 0.8, b.dielectric(1.5))
    # Dark quad patch FULLY inside the glass sphere's screen disk: visible
    # only as its refracted image.
    b.add_quad((-0.5, -0.5, -4.0), (1.0, 0, 0), (0, 1.0, 0),
               b.lambertian((0.05, 0.05, 0.05)))
    scene = b.build()
    cam, _ = make_camera(1.0, W, fov_degrees=40, look_from=(0, 0, 1),
                         look_at=(0, 0, -2), background=(1.0, 1.0, 1.0))
    return scene, cam


def test_refracted_silhouette_gap_quantified():
    scene, cam = _glass_scene()
    params, rebuild = split_scene(scene, ("quad_q", "quad_u"))

    def loss(p, key):
        img = render_linear_diff(rebuild(p), cam, key, **KW)
        return jnp.mean(img**2)

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
    assert fd < -0.03, (fd, fds)  # strong, repeatable FD signal

    bfn = make_boundary_image_fn(rebuild, width=W, height=H, max_depth=6)

    def loss_b(p, key, use_b):
        img = render_linear_diff(rebuild(p), cam, key, **KW)
        if use_b:
            img = img + bfn(p, cam, jax.random.fold_in(key, 7))
        return jnp.mean(img**2)

    for use_b in (False, True):
        g = jax.grad(partial(loss_b, key=jax.random.PRNGKey(0), use_b=use_b))(
            params
        )
        # The gap is ~100%: interior and primary-boundary AD are BLIND on
        # this axis (the recovery via diff/refracted_edge.py is asserted
        # by tests/test_refracted_edge.py).
        assert abs(float(g["quad_u"][0, 0])) < 0.1 * abs(fd), (
            use_b,
            float(g["quad_u"][0, 0]),
            fd,
        )
