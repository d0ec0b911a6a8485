"""Tape-replay differentiable backend (diff/tape.py): value and gradient
identity with the scan backend.

The replay is the scan integrator minus the losing intersection candidates
(which the frozen argmin where's out of the gradient anyway), so for the
same injected uniforms the radiance must match to f32 tolerance and the
parameter gradients must agree closely."""

import numpy as np
import jax
import jax.numpy as jnp

from raytracer_tpu.core.camera import camera_frame, camera_rays, make_camera
from raytracer_tpu.diff.tape import render_linear_tape, trace_tape
from raytracer_tpu.geometry.scene import SceneBuilder
from raytracer_tpu.integrator.wavefront import trace
from raytracer_tpu.materials.materials import UNIFORMS_PER_BOUNCE

DEPTH = 8


def _zoo():
    b = SceneBuilder(0)
    b.add_sphere((0, -1000.5, 0), 1000.0,
                 b.lambertian(b.checker(0.32, (0.2, 0.3, 0.1), (0.9, 0.9, 0.9))))
    b.add_sphere((-1.6, 0.5, -1), 0.9, b.lambertian((0.7, 0.3, 0.3)))
    b.add_sphere((0.6, 0.4, 0.3), 0.6, b.metal((0.8, 0.7, 0.6), 0.3))
    glass = b.dielectric(1.5)
    b.add_sphere((1.8, 0.4, -0.8), 0.5, glass)
    b.add_sphere((1.8, 0.4, -0.8), -0.4, glass)
    b.add_sphere((0.0, 2.6, -1.0), 0.5, b.diffuse_light((4, 3, 2)))
    b.add_quad((-2.5, 0.0, -3.0), (2.0, 0, 0), (0, 2.0, 0), b.lambertian((0.2, 0.8, 0.2)))
    return b.build()


def _rays(scene, n_rays=256, seed=3):
    cam, settings = make_camera(
        1.0, 16, samples_per_pixel=1, max_depth=DEPTH,
        background=(0.6, 0.7, 0.9), look_from=(0, 1.2, 6), look_at=(0, 0.4, 0),
        fov_degrees=50,
    )
    rng = np.random.default_rng(seed)
    w = settings.width
    pix = rng.integers(0, w * w, n_rays).astype(np.int32)
    frame = camera_frame(cam, w, w)
    o, d = camera_rays(
        frame, jnp.asarray(pix % w), jnp.asarray(pix // w),
        jnp.asarray(rng.random((n_rays, 4), np.float32)),
    )
    uni = jnp.asarray(rng.random((DEPTH, n_rays, UNIFORMS_PER_BOUNCE), np.float32))
    return cam, o, d, uni


def test_tape_value_matches_scan():
    scene = _zoo()
    cam, o, d, uni = _rays(scene)
    scan = np.asarray(trace(
        scene, o, d, jax.random.PRNGKey(0), cam.background,
        max_depth=DEPTH, differentiable=True, uniform_seq=uni,
    ))
    tape = np.asarray(trace_tape(
        scene, o, d, uni, cam.background, max_depth=DEPTH,
    ))
    np.testing.assert_allclose(tape, scan, rtol=1e-5, atol=1e-5)


def test_tape_gradients_match_scan():
    scene = _zoo()
    cam, o, d, uni = _rays(scene)
    wfix = jax.random.uniform(jax.random.PRNGKey(4), (o.shape[0], 3))
    trainable = ("sph_center", "sph_radius", "mat_albedo", "mat_fuzz", "mat_ior", "quad_q")
    params = {k: getattr(scene, k) for k in trainable}

    def loss_scan(p):
        sc = scene.replace(**p)
        r = trace(sc, o, d, jax.random.PRNGKey(0), cam.background,
                  max_depth=DEPTH, differentiable=True, uniform_seq=uni)
        return jnp.mean(r * wfix)

    def loss_tape(p):
        sc = scene.replace(**p)
        r = trace_tape(sc, o, d, uni, cam.background, max_depth=DEPTH)
        return jnp.mean(r * wfix)

    g_scan = jax.grad(loss_scan)(params)
    g_tape = jax.grad(loss_tape)(params)
    for k in trainable:
        a, b = np.asarray(g_scan[k]), np.asarray(g_tape[k])
        scale = max(np.abs(a).max(), 1e-6)
        np.testing.assert_allclose(b, a, rtol=1e-4, atol=2e-5 * scale, err_msg=k)


def test_tape_camera_gradients():
    """Camera pytree gradients flow through the replay's differentiable
    camera rays (the tape itself is stop-grad, like the frozen argmin)."""
    scene = _zoo()
    cam, *_ = _rays(scene)
    kw = dict(width=12, height=12, samples_per_pass=4, max_depth=4)

    def loss(c):
        return jnp.mean(render_linear_tape(scene, c, jax.random.PRNGKey(1), **kw))

    g = jax.grad(loss)(cam)
    flat = np.concatenate([np.ravel(np.asarray(x)) for x in jax.tree_util.tree_leaves(g)])
    assert np.isfinite(flat).all()
    assert np.abs(flat).max() > 1e-6  # something actually flows


def test_render_linear_tape_image_statistics():
    """Image-level sanity: tape and scan renders of the same scene agree in
    expectation (independent sample streams; compare means)."""
    from raytracer_tpu.diff.grad import render_linear_diff

    scene = _zoo()
    cam, settings = make_camera(
        1.0, 24, samples_per_pixel=1, max_depth=6,
        background=(0.6, 0.7, 0.9), look_from=(0, 1.2, 6), look_at=(0, 0.4, 0),
        fov_degrees=50,
    )
    kw = dict(width=24, height=24, samples_per_pass=32, max_depth=6)
    a = np.mean([np.asarray(render_linear_tape(scene, cam, jax.random.PRNGKey(i), **kw))
                 for i in range(4)], axis=0)
    b = np.mean([np.asarray(render_linear_diff(scene, cam, jax.random.PRNGKey(50 + i), **kw))
                 for i in range(4)], axis=0)
    np.testing.assert_allclose(a.mean((0, 1)), b.mean((0, 1)), rtol=0.05, atol=0.01)
