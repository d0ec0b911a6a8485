"""Pallas intersect kernel vs the jnp dense reference (oracle test,
SURVEY.md §4.2). Runs in interpreter mode on CPU."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from raytracer_tpu.geometry.intersect import intersect_scene, quad_derived
from raytracer_tpu.geometry.scene import SceneBuilder
from raytracer_tpu.ops import intersect_kernel as ik


def _scene(rng):
    b = SceneBuilder(0)
    m = b.lambertian((0.5, 0.5, 0.5))
    for _ in range(20):
        b.add_sphere(rng.uniform(-5, 5, 3), rng.uniform(0.3, 1.5), m)
    for _ in range(6):
        b.add_quad(rng.uniform(-5, 5, 3), rng.uniform(-2, 2, 3), rng.uniform(-2, 2, 3), m)
    return b.build()


@pytest.mark.parametrize("interpret", [True])
def test_kernel_matches_dense(rng, interpret, monkeypatch):
    scene = _scene(rng)
    sph_t = ik.pack_sphere_table(scene.sph_center, scene.sph_radius)
    quad_t = ik.pack_quad_table(quad_derived(scene))
    n = 8 * 128  # one tile
    o = jnp.asarray(rng.uniform(-8, 8, (n, 3)).astype(np.float32))
    target = jnp.asarray(rng.uniform(-4, 4, (n, 3)).astype(np.float32))
    d = target - o

    if interpret:
        import jax.experimental.pallas as pl

        orig = pl.pallas_call
        monkeypatch.setattr(
            pl, "pallas_call", lambda *a, **k: orig(*a, **{**k, "interpret": True})
        )
    t_k, p_k = ik.intersect_pallas(sph_t, quad_t, o, d, rows=8)
    ref = intersect_scene(scene, o, d)

    t_k = np.asarray(t_k)
    p_k = np.asarray(p_k)
    hit_r = np.asarray(ref.hit)
    assert ((np.isfinite(t_k)) == hit_r).mean() > 0.999
    both = np.isfinite(t_k) & hit_r
    assert both.sum() > 200
    np.testing.assert_allclose(
        t_k[both], np.asarray(ref.t)[both], rtol=1e-4, atol=1e-5
    )
    agree = (p_k[both] == np.asarray(ref.prim_id)[both]).mean()
    assert agree > 0.999, agree


def test_wavefront_megakernel_interpret(rng, monkeypatch):
    """Fused regen+camera+intersect kernel vs the jnp pieces, interpreter
    mode on CPU (covers the TPU default path in CI)."""
    import jax
    import jax.experimental.pallas as pl

    from raytracer_tpu.core.camera import camera_frame, make_camera
    from raytracer_tpu.ops.wavefront_kernel import (
        pack_camera_scalars,
        wavefront_step_pallas,
    )

    scene = _scene(rng)
    cam, settings = make_camera(
        1.0, 32, fov_degrees=60, look_from=(0, 0, 8), look_at=(0, 0, 0)
    )
    frame = camera_frame(cam, 32, 32)
    sph_t = ik.pack_sphere_table(scene.sph_center, scene.sph_radius)
    quad_t = ik.pack_quad_table(quad_derived(scene))

    from jax.experimental.pallas import tpu as pltpu

    n = 8 * 128
    lane = np.arange(n, dtype=np.int32)
    pix = lane % (32 * 32)
    ctx = pltpu.force_tpu_interpret_mode()
    ctx.__enter__()
    out = wavefront_step_pallas(
        sph_t,
        quad_t,
        pack_camera_scalars(frame),
        jnp.int32(7),
        jnp.zeros((n, 3), jnp.float32),
        jnp.ones((n, 3), jnp.float32),
        jnp.zeros((n,), bool),  # all idle -> all granted
        jnp.ones((n,), jnp.int32),
        jnp.asarray(pix % 32),
        jnp.asarray(pix // 32),
        jnp.full((n,), -1, jnp.int32),
        width=32,
        height=32,
        jump_px=0,
        jump_py=0,
        rows=8,
    )
    out = {k: np.asarray(v) for k, v in out.items()}
    ctx.__exit__(None, None, None)
    assert bool(np.asarray(out["grant"]).all())
    np.testing.assert_array_equal(np.asarray(out["sample_k"]), 0)
    np.testing.assert_array_equal(np.asarray(out["remaining"]), 0)
    uni = np.asarray(out["uniforms"])
    assert (uni >= 0).all() and (uni < 1).all()
    # NOTE: the interpreter stubs prng_random_bits to zeros, so distribution
    # checks are meaningless here (covered on real TPU); zero uniforms still
    # exercise the full camera/intersect path deterministically.

    # The kernel's camera rays + intersection agree with the jnp reference
    # applied to the kernel's own rays.
    o = np.asarray(out["origin"])
    d = np.asarray(out["direction"])
    ref = intersect_scene(scene, jnp.asarray(o), jnp.asarray(d))
    t_k = np.asarray(out["t"])
    hit_r = np.asarray(ref.hit)
    assert (np.isfinite(t_k) == hit_r).mean() > 0.995
    both = np.isfinite(t_k) & hit_r
    assert both.sum() > 100
    np.testing.assert_allclose(
        t_k[both], np.asarray(ref.t)[both], rtol=2e-4, atol=1e-4
    )
    # Camera rays point from the camera center toward the viewport.
    np.testing.assert_allclose(o, np.tile(np.asarray(frame.center), (n, 1)), atol=1e-6)
