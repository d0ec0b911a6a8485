"""Unified gradient backend (round 5, VERDICT r4 #3): the depth-bucketed
tape-replay backend composes with the visibility-boundary terms
(diff/boundary.py, diff/shadow_edge.py) and routes CAMERA gradients
through the replay — speed and silhouettes/camera no longer trade off.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from raytracer_tpu.core.camera import camera_frame, camera_rays, make_camera
from raytracer_tpu.diff.bucketed import (
    CAMERA_PARAM_KEY,
    _lane_uniforms,
    make_bucketed_grad_fn,
    split_camera,
)
from raytracer_tpu.diff.grad import (
    make_inverse_renderer,
    render_linear_diff,
    split_scene,
)
from raytracer_tpu.diff.tape import make_tape_intersect_fn
from raytracer_tpu.geometry.scene import SceneBuilder
from raytracer_tpu.integrator.wavefront import trace


def _sphere_scene():
    b = SceneBuilder(0)
    b.add_sphere((0.0, 0.0, -3.0), 1.0, b.lambertian((0.6, 0.3, 0.2)))
    return b.build()


def test_bucketed_camera_grads_match_full_depth_replay():
    """Camera leaves under params['camera'] get gradients through the
    bucketed replay EQUAL (to fp tolerance) to a same-uniforms full-depth
    replay differentiating the camera directly — the camera analog of the
    bucketed/scan parity test.

    The scene needs a DIELECTRIC: with flat-albedo materials and a flat
    background the interior radiance is a product of constants and every
    interior camera gradient is exactly zero (the boundary term owns it
    all); the dielectric's likelihood-ratio factor depends on the
    incidence angle, so look_from/fov gradients flow through the replay."""
    b = SceneBuilder(0)
    b.add_sphere((0.0, 0.0, -3.0), 1.0, b.lambertian((0.6, 0.3, 0.2)))
    b.add_sphere((0.6, 0.4, -2.0), 0.5, b.dielectric(1.5))
    scene = b.build()
    cam, _ = make_camera(
        1.0, 24, fov_degrees=55, look_from=(0, 0, 0), look_at=(0, 0, -3),
        defocus_angle_degrees=1.5, background=(0.6, 0.7, 0.9),
    )
    w = h = 24
    spp, max_depth = 2, 4
    n, total = w * h, w * h * spp
    target = jnp.zeros((h, w, 3), jnp.float32)

    params, rebuild = split_scene(scene, ("sph_center", "tex_c0"))
    cam_trainable = ("look_from", "fov_radians", "background")
    cam_params, rebuild_camera = split_camera(cam, cam_trainable)
    params = dict(params)
    params[CAMERA_PARAM_KEY] = cam_params
    key = jax.random.PRNGKey(11)

    step = make_bucketed_grad_fn(
        rebuild, cam, target, width=w, height=h, samples_per_pass=spp,
        max_depth=max_depth, sky_gradient=False, quant=64,
        rebuild_camera=rebuild_camera,
    )
    loss_b, grads_b = step(params, key)

    def ref_loss(p):
        sc = rebuild({k: v for k, v in p.items() if k != CAMERA_PARAM_KEY})
        cam_p = rebuild_camera(p[CAMERA_PARAM_KEY])
        frame = camera_frame(cam_p, w, h)
        key_cam, key_u = jax.random.split(key)
        pix = jnp.arange(total, dtype=jnp.int32) % n
        cam_uni = jax.random.uniform(key_cam, (total, 4), jnp.float32)
        o, d = camera_rays(frame, pix % w, pix // w, cam_uni)
        useq = jnp.transpose(
            _lane_uniforms(key_u, jnp.arange(total, dtype=jnp.int32), max_depth),
            (1, 0, 2),
        )
        sg = jax.lax.stop_gradient
        _, tape = trace(
            sg(sc), sg(o), sg(d), jax.random.PRNGKey(0), sg(cam_p.background),
            max_depth=max_depth, sky_gradient=False, uniform_seq=sg(useq),
            return_tape=True,
        )
        radiance = trace(
            sc, o, d, jax.random.PRNGKey(0), cam_p.background,
            max_depth=max_depth, sky_gradient=False, differentiable=True,
            uniform_seq=useq, intersect_fn=make_tape_intersect_fn(tape),
            intersect_fn_differentiable=True,
        )
        img = radiance.reshape(spp, n, 3).mean(0).reshape(h, w, 3)
        return jnp.mean((img - target) ** 2)

    loss_r, grads_r = jax.value_and_grad(ref_loss)(params)
    np.testing.assert_allclose(float(loss_b), float(loss_r), rtol=1e-5)
    for name in cam_trainable:
        got = np.asarray(grads_b[CAMERA_PARAM_KEY][name])
        want = np.asarray(grads_r[CAMERA_PARAM_KEY][name])
        assert np.any(want != 0.0), f"camera grad {name} is zero in ref"
        np.testing.assert_allclose(got, want, rtol=6e-3, atol=1e-6,
                                   err_msg=f"camera.{name}")
    np.testing.assert_allclose(
        np.asarray(grads_b["sph_center"]), np.asarray(grads_r["sph_center"]),
        rtol=6e-3, atol=1e-4,
    )


def test_bucketed_boundary_recovers_center():
    """The boundary-composition recovery: a laterally displaced sphere
    center is invisible to interior gradients (flat-shaded convex
    silhouette) and recoverable with the composed boundary term — same
    scenario as test_boundary_grad.test_inverse_rendering_recovers_center,
    through the BUCKETED backend."""
    W = H = 32
    scene = _sphere_scene()
    cam, _ = make_camera(1.0, W, fov_degrees=55, look_from=(0, 0, 0),
                         look_at=(0, 0, -3))
    kw = dict(width=W, height=H, samples_per_pass=2, max_depth=3,
              sky_gradient=True)
    target = render_linear_diff(scene, cam, jax.random.PRNGKey(42), **kw)
    wrong = scene.replace(
        sph_center=scene.sph_center.at[0].set(jnp.array([0.35, -0.25, -3.0]))
    )
    params, opt_state, step = make_inverse_renderer(
        wrong, cam, target, trainable=("sph_center",), **kw,
        optimizer=optax.adam(3e-2), boundary=True, backend="bucketed",
    )
    key = jax.random.PRNGKey(7)
    for i in range(50):
        params, opt_state, _ = step(params, opt_state, jax.random.fold_in(key, i))
    got = np.asarray(params["sph_center"][0])
    np.testing.assert_allclose(got, [0.0, 0.0, -3.0], atol=0.08)


def test_bucketed_shadow_edges_compose():
    """boundary+shadow_edges together through the bucketed backend produce
    finite, nonzero blocker gradients (full composition smoke; the
    estimator's correctness is pinned by test_boundary_grad's FD tests)."""
    b = SceneBuilder(0)
    b.add_quad((-4, 0, -8), (8, 0, 0), (0, 0, 8), b.lambertian((0.7, 0.7, 0.7)))
    b.add_sphere((0.0, 1.2, -4.0), 0.5, b.lambertian((0.4, 0.4, 0.8)))
    b.add_sphere((0.0, 4.0, -4.0), 1.0, b.diffuse_light((12, 12, 12)))
    scene = b.build()
    cam, _ = make_camera(1.0, 24, fov_degrees=60, look_from=(0, 2.5, 2),
                         look_at=(0, 0.5, -4))
    target = jnp.zeros((24, 24, 3), jnp.float32)
    params, opt_state, step = make_inverse_renderer(
        scene, cam, target, trainable=("sph_center",), width=24, height=24,
        samples_per_pass=2, max_depth=3, boundary=True, shadow_edges=True,
        backend="bucketed",
    )
    params, opt_state, loss = step(params, opt_state, jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))
    assert np.isfinite(np.asarray(params["sph_center"])).all()
