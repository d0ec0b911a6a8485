"""In-kernel winner tape (round 5): the persistent kernel's tape mode must
be BIT-IDENTICAL to the XLA integrator fed the same counter-RNG uniforms —
that identity is what lets diff/bucketed.py replay gradients against a
forward that ran at production-kernel speed (VERDICT r4 next-steps #1).

Run under the Pallas TPU interpreter on CPU: tape mode uses the stateless
counter RNG (ops/ctr_rng.py) instead of the hardware PRNG, so unlike the
production kernel's statistical tests, these pin exact equality.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from raytracer_tpu.core.camera import camera_frame, camera_rays, make_camera
from raytracer_tpu.geometry.intersect import quad_derived
from raytracer_tpu.geometry.scene import SceneBuilder
from raytracer_tpu.integrator.wavefront import trace
from raytracer_tpu.ops import ctr_rng
from raytracer_tpu.ops.persistent_kernel import (
    LANES,
    pack_camera_scalars_bg,
    pack_persistent_tables,
    render_persistent_tape,
)


def _mixed_scene():
    """All four materials + a quad + checker so every scatter branch and
    the winner-id convention (quads after spheres) cross the tape."""
    b = SceneBuilder(0)
    ground = b.lambertian(b.checker(0.6, (0.2, 0.3, 0.1), (0.9, 0.9, 0.9)))
    b.add_sphere((0, -100.5, -1), 100, ground)
    b.add_sphere((0, 0, -1), 0.5, b.dielectric(1.5))
    b.add_sphere((-1.1, 0, -1), 0.5, b.metal((0.8, 0.6, 0.2), 0.3))
    b.add_sphere((1.1, 0.8, -1), 0.3, b.diffuse_light((4, 4, 4)))
    b.add_quad((-2, -0.4, -2.5), (4, 0, 0), (0, 2, 0),
               b.lambertian((0.4, 0.5, 0.8)))
    scene = b.build()
    cam, _ = make_camera(
        16 / 9, 64, look_from=(0, 0.5, 2), look_at=(0, 0, -1),
        fov_degrees=60, background=(0.7, 0.8, 1.0),
        defocus_angle_degrees=2.0,
    )
    return scene, cam


def _schedule(total: int, n_pix: int, width: int, rows: int):
    tile = rows * LANES
    n = -(-total // tile) * tile
    sid = np.arange(n, dtype=np.int32)
    pix = sid % n_pix
    return (
        jnp.asarray((sid < total).astype(np.int32)),
        jnp.asarray((pix % width).astype(np.int32)),
        jnp.asarray((pix // width).astype(np.int32)),
        jnp.asarray(sid),
    )


def test_kernel_tape_bit_identity_with_xla_forward():
    """Tape EXACTLY equal and per-lane radiance exactly equal between the
    kernel tape mode and trace() consuming identical counter uniforms (the
    replay contract of diff/bucketed.py's kernel forward)."""
    scene, cam = _mixed_scene()
    width, height, max_depth, rows, spp, seed = 64, 36, 8, 8, 2, 12345
    n_pix = width * height
    total = spp * n_pix
    rem0, px0, py0, sid0 = _schedule(total, n_pix, width, rows)

    frame = camera_frame(cam, width, height)
    sph_p, quad_p, res_p = pack_persistent_tables(scene, quad_derived(scene))
    with pltpu.force_tpu_interpret_mode():
        rad_k, tape_k, segs, _ = render_persistent_tape(
            sph_p, quad_p, res_p,
            pack_camera_scalars_bg(frame, cam.background),
            seed, rem0, px0, py0, sid0, None,
            width=width, height=height, rows=rows, max_depth=max_depth,
        )
    rad_k = np.asarray(rad_k)[:, :total].T
    tape_k = np.asarray(tape_k)[:, :total]
    assert int(segs) >= total  # every lane traced at least its camera ray

    sidj = sid0[:total]
    cam_uni = ctr_rng.camera_uniforms(seed, sidj)
    o, d = camera_rays(frame, px0[:total], py0[:total], cam_uni)
    useq = ctr_rng.bounce_uniform_seq(seed, sidj, max_depth)
    rad_x, tape_x = trace(
        scene, o, d, jax.random.PRNGKey(0), cam.background,
        max_depth=max_depth, uniform_seq=useq, return_tape=True,
    )
    np.testing.assert_array_equal(tape_k, np.asarray(tape_x))
    np.testing.assert_array_equal(rad_k, np.asarray(rad_x))


def test_kernel_bucketed_grads_match_full_depth_replay():
    """make_bucketed_grad_fn(forward='kernel') == one full-depth replay
    with the same counter uniforms: loss and every parameter gradient to fp
    tolerance (the kernel-forward analog of
    test_grad.test_bucketed_grads_match_full_depth_scan)."""
    from functools import partial

    from raytracer_tpu.diff.bucketed import make_bucketed_grad_fn
    from raytracer_tpu.diff.grad import split_scene
    from raytracer_tpu.diff.tape import make_tape_intersect_fn

    scene, cam = _mixed_scene()
    w, h, spp, max_depth = 32, 18, 2, 6
    n, total = w * h, w * h * spp
    params, rebuild = split_scene(scene)
    key = jax.random.PRNGKey(5)
    target = jnp.zeros((h, w, 3), jnp.float32)

    with pltpu.force_tpu_interpret_mode():
        step = make_bucketed_grad_fn(
            rebuild, cam, target, width=w, height=h, samples_per_pass=spp,
            max_depth=max_depth, quant=256, forward="kernel",
            scene_probe=scene, tape_rows=8,
        )
        loss_b, grads_b = step(params, key)
        # Bucketing machinery is EXACT: a single full-depth bucket through
        # the same code path gives identical grads to ~fp accumulation
        # order (measured 6.8e-7 rel on this scene).
        step1 = make_bucketed_grad_fn(
            rebuild, cam, target, width=w, height=h, samples_per_pass=spp,
            max_depth=max_depth, quant=256, forward="kernel",
            scene_probe=scene, tape_rows=8, depths=(max_depth,),
        )
        loss_1, grads_1 = step1(params, key)
    np.testing.assert_allclose(float(loss_b), float(loss_1), rtol=1e-7)
    for name in params:
        np.testing.assert_allclose(
            np.asarray(grads_b[name]), np.asarray(grads_1[name]),
            rtol=1e-5, atol=1e-8, err_msg=name,
        )

    seed = jax.random.randint(key, (), 0, 2**31 - 1, jnp.int32)

    def ref_loss(p):
        sc = rebuild(p)
        frame = camera_frame(cam, w, h)
        sid = jnp.arange(total, dtype=jnp.int32)
        pix = sid % n
        cam_uni = ctr_rng.camera_uniforms(seed, sid)
        o, d = camera_rays(frame, pix % w, pix // w, cam_uni)
        useq = ctr_rng.bounce_uniform_seq(seed, sid, max_depth)
        sg = jax.lax.stop_gradient
        _, tape = trace(
            sg(sc), sg(o), sg(d), jax.random.PRNGKey(0), sg(cam.background),
            max_depth=max_depth, uniform_seq=sg(useq), return_tape=True,
        )
        radiance = trace(
            sc, o, d, jax.random.PRNGKey(0), cam.background,
            max_depth=max_depth, differentiable=True, uniform_seq=useq,
            intersect_fn=make_tape_intersect_fn(tape),
            intersect_fn_differentiable=True,
        )
        img = radiance.reshape(spp, n, 3).mean(0).reshape(h, w, 3)
        return jnp.mean((img - target) ** 2)

    loss_r, grads_r = jax.value_and_grad(ref_loss)(params)
    np.testing.assert_allclose(float(loss_b), float(loss_r), rtol=1e-5)
    # Geometry grads carry the tape backend's fp-path property: the
    # cotangent comes from the (kernel == dense-XLA, bit-identical) forward
    # image while ref differentiates the MSE through the REPLAY image,
    # whose winner-t is recomputed with a different float association
    # (_winner_t_diff docstring; same residual the XLA-bucketed test
    # documents). Measured here: <= 4.2e-3 rel / 4.8e-5 abs on sph_center;
    # non-geometry leaves agree to ~1e-6.
    for name in params:
        np.testing.assert_allclose(
            np.asarray(grads_b[name]), np.asarray(grads_r[name]),
            rtol=6e-3, atol=1e-4, err_msg=name,
        )


def test_ctr_rng_statistics():
    """The counter hash is Monte Carlo grade: per-stream moments, lane and
    counter decorrelation, and 23-bit mantissa construction."""
    seed = jnp.int32(7)
    lanes = jnp.arange(4096, dtype=jnp.int32)
    u = ctr_rng.bounce_uniform_seq(seed, lanes, 16)  # (16, 4096, 3)
    u = np.asarray(u)
    assert u.min() >= 0.0 and u.max() < 1.0
    np.testing.assert_allclose(u.mean(), 0.5, atol=5e-3)
    np.testing.assert_allclose(u.var(), 1.0 / 12.0, rtol=2e-2)
    # Neighbor-lane and neighbor-counter correlation ~ 0.
    flat = u.reshape(16, 4096 * 3)
    c_lane = np.corrcoef(u[:, :-1, :].ravel(), u[:, 1:, :].ravel())[0, 1]
    c_ctr = np.corrcoef(flat[:-1].ravel(), flat[1:].ravel())[0, 1]
    assert abs(c_lane) < 0.02 and abs(c_ctr) < 0.02
    # Camera draws occupy counters 0..3, bounce draws start at 4: streams
    # must not collide.
    cu = np.asarray(ctr_rng.camera_uniforms(seed, lanes))
    assert not np.shares_memory(cu, u)
    assert np.abs(cu[:, 0] - u[0, :, 0]).max() > 0  # distinct draws


def test_ctr_rng_matches_between_shapes():
    """Counter draws are pure functions of (seed, lane, ctr): any slicing /
    reshaping regenerates identical values (the bucket-subset property the
    replay depends on)."""
    seed = jnp.int32(99)
    lanes = jnp.arange(512, dtype=jnp.int32)
    full = np.asarray(ctr_rng.bounce_uniform_seq(seed, lanes, 12))
    sub_lanes = lanes[100:200]
    sub = np.asarray(ctr_rng.bounce_uniform_seq(seed, sub_lanes, 5))
    np.testing.assert_array_equal(sub, full[:5, 100:200, :])
    cam_full = np.asarray(ctr_rng.camera_uniforms(seed, lanes))
    cam_sub = np.asarray(ctr_rng.camera_uniforms(seed, sub_lanes))
    np.testing.assert_array_equal(cam_sub, cam_full[100:200])


def test_two_phase_forward_matches_single_phase():
    """fwd_cap < max_depth splits the tape forward (capped kernel + XLA
    continuation of the lanes still alive at the cap). The counter-RNG
    identity makes the continuation bit-exact, so loss and gradients must
    match the single-phase kernel forward to fp-accumulation noise."""
    from raytracer_tpu.diff.bucketed import make_bucketed_grad_fn
    from raytracer_tpu.diff.grad import split_scene

    scene, cam = _mixed_scene()
    w, h, spp, max_depth = 32, 18, 2, 8
    params, rebuild = split_scene(scene)
    key = jax.random.PRNGKey(9)
    target = jnp.zeros((h, w, 3), jnp.float32)

    outs = []
    with pltpu.force_tpu_interpret_mode():
        for cap in (0, 3):  # 0 = single phase, 3 = two-phase
            step = make_bucketed_grad_fn(
                rebuild, cam, target, width=w, height=h,
                samples_per_pass=spp, max_depth=max_depth, quant=256,
                forward="kernel", scene_probe=scene, tape_rows=8,
                fwd_cap=cap,
            )
            outs.append(step(params, key))
    (loss_a, grads_a), (loss_b, grads_b) = outs
    np.testing.assert_allclose(float(loss_a), float(loss_b), rtol=1e-7)
    for name in params:
        np.testing.assert_allclose(
            np.asarray(grads_a[name]), np.asarray(grads_b[name]),
            rtol=1e-5, atol=1e-8, err_msg=name,
        )
