"""End-to-end GetColor oracle (VERDICT round 1, Next-round item 3).

The scalar NumPy port of Ray.GetColor (/root/reference/internal/ray.go:32-54,
tests/oracle.py:get_color) and the wavefront trace() consume the SAME injected
per-bounce uniforms, so their per-ray radiance must agree to float32 tolerance
on every material/texture combination at depth >= 8. A failing shade or
miss/emit/scatter rule is caught by a test the wavefront cannot also be wrong
about (the oracle is branchy scalar recursion, architecturally independent).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from raytracer_tpu.core.camera import camera_frame, camera_rays, make_camera
from raytracer_tpu.geometry.scene import SceneBuilder
from raytracer_tpu.integrator.wavefront import trace

from oracle import OracleScene, get_color

MAX_DEPTH = 8


def _zoo_scene():
    """Every material x texture combination the reference supports."""
    rng = np.random.default_rng(11)
    b = SceneBuilder(0)
    # Ground: checkered lambertian (main.go:241-247).
    b.add_sphere((0, -1000.5, 0), 1000.0, b.lambertian(b.checker(0.32, (0.2, 0.3, 0.1), (0.9, 0.9, 0.9))))
    # Lambertian solid / image / noise spheres.
    b.add_sphere((-2.2, 0.5, -1), 0.9, b.lambertian((0.7, 0.3, 0.3)))
    img = (rng.uniform(0.05, 0.95, (7, 13, 3))).astype(np.float32)
    b.add_sphere((0.0, 0.6, -2.5), 1.0, b.lambertian(b.image(img)))
    b.add_sphere((2.3, 0.4, -1.2), 0.8, b.lambertian(b.noise(2.5)))
    # Metal (fuzzy) + dielectric with the hollow-glass trick (negative radius,
    # main.go's glass pattern / hittables.go:119-120).
    b.add_sphere((-0.9, 0.3, 0.6), 0.7, b.metal((0.8, 0.7, 0.6), 0.35))
    glass = b.dielectric(1.5)
    b.add_sphere((1.1, 0.4, 0.8), 0.6, glass)
    b.add_sphere((1.1, 0.4, 0.8), -0.45, glass)
    # Emissive sphere + emissive quad (simpleLight / cornell patterns).
    b.add_sphere((0.0, 2.8, -1.0), 0.5, b.diffuse_light((4, 3, 2)))
    b.add_quad((-1.5, 2.2, 0.2), (1.2, 0, 0), (0, 0, 1.0), b.diffuse_light((2, 2, 5)))
    # Lambertian + metal quads (quadDemo pattern).
    b.add_quad((-3.5, 0.0, -3.0), (2.4, 0, 0), (0, 2.2, 0), b.lambertian((0.2, 0.8, 0.2)))
    b.add_quad((1.5, 0.0, -3.0), (2.0, 0, 0), (0, 2.0, 0.4), b.metal((0.9, 0.9, 0.9), 0.0))
    return b.build()


def _compare(scene, background, sky_gradient, n_rays=192, seed=5):
    """Shared harness: shoot camera rays, inject uniforms, compare per ray."""
    cam, settings = make_camera(
        1.0,
        16,
        samples_per_pixel=1,
        max_depth=MAX_DEPTH,
        background=background,
        look_from=(0, 1.2, 6),
        look_at=(0, 0.5, 0),
        fov_degrees=55,
        defocus_angle_degrees=0.8,
        focus_dist=6.0,
    )
    rng = np.random.default_rng(seed)
    w = settings.width
    pix = rng.integers(0, w * w, n_rays).astype(np.int32)
    cam_uni = rng.random((n_rays, 4), np.float32)
    frame = camera_frame(cam, w, w)
    o, d = camera_rays(frame, jnp.asarray(pix % w), jnp.asarray(pix // w), jnp.asarray(cam_uni))

    uniforms = rng.random((MAX_DEPTH, n_rays, 3), np.float32)
    got = np.asarray(
        trace(
            scene,
            o,
            d,
            jax.random.PRNGKey(0),  # unused: uniforms injected
            jnp.asarray(background, jnp.float32),
            max_depth=MAX_DEPTH,
            sky_gradient=sky_gradient,
            uniform_seq=jnp.asarray(uniforms),
        )
    )

    S = OracleScene(scene)
    o_np, d_np = np.asarray(o), np.asarray(d)
    want = np.stack(
        [
            get_color(
                S,
                o_np[i],
                d_np[i],
                MAX_DEPTH,
                uniforms[:, i, :],
                background,
                sky_gradient=sky_gradient,
            )
            for i in range(n_rays)
        ]
    )

    err = np.abs(got - want) / (1.0 + np.abs(want))
    per_ray = err.max(axis=1)
    # f32-vs-f64 rounding can flip a knife-edge decision (hit at a sphere
    # edge, Schlick coin within 1 ulp); allow a tiny fraction of such rays.
    bad = per_ray > 2e-3
    assert bad.mean() <= 0.02, (
        f"{bad.sum()}/{n_rays} rays disagree; worst {per_ray.max():.4f} "
        f"at ray {per_ray.argmax()}"
    )
    matched = ~bad
    np.testing.assert_allclose(got[matched], want[matched], rtol=2e-3, atol=2e-3)
    # The estimator as a whole must agree tightly.
    np.testing.assert_allclose(got.mean(), want.mean(), rtol=5e-3, atol=1e-4)


def test_getcolor_oracle_flat_background():
    _compare(_zoo_scene(), (0.7, 0.8, 1.0), sky_gradient=False)


def test_getcolor_oracle_sky_gradient():
    _compare(_zoo_scene(), (0.0, 0.0, 0.0), sky_gradient=True)


def test_getcolor_oracle_black_background_lights_only():
    """simpleLight configuration: black bg, radiance only via emitters."""
    _compare(_zoo_scene(), (0.0, 0.0, 0.0), sky_gradient=False, seed=7)


@pytest.mark.parametrize(
    "name,spp",
    [
        ("rand_spheres", 2),
        ("earth", 6),
        ("perlin", 4),
        ("quads", 6),
        ("simple_light", 6),
        ("cornell", 4),
    ],
)
def test_scene_oracle_parity(name, spp):
    """All six reference scenes, every pixel at a tiny resolution, SAME
    injected uniforms through the scalar oracle and the wavefront: the mean
    images must agree per pixel (not just statistically). This replaces the
    round-1 self-pinned golden stats as the parity claim: the oracle is an
    independent scalar port of the cited reference formulas."""
    from raytracer_tpu.scenes.registry import get_scene

    depth = 10
    scene, cam, settings = get_scene(name, width=16, spp=spp, max_depth=depth)
    w, h = settings.width, settings.height
    n_pix = w * h
    n_rays = n_pix * spp

    # NOT hash(name): Python string hashing is salted per process, which made
    # this test draw different uniforms every run (flaky at the knife-edge
    # allowance). crc32 is stable.
    import zlib

    rng = np.random.default_rng(zlib.crc32(name.encode()))
    pix = np.repeat(np.arange(n_pix, dtype=np.int32), spp)
    cam_uni = rng.random((n_rays, 4), np.float32)
    frame = camera_frame(cam, w, h)
    o, d = camera_rays(frame, jnp.asarray(pix % w), jnp.asarray(pix // w), jnp.asarray(cam_uni))
    uniforms = rng.random((depth, n_rays, 3), np.float32)

    got = np.asarray(
        trace(
            scene, o, d, jax.random.PRNGKey(0), cam.background,
            max_depth=depth, sky_gradient=settings.sky_gradient,
            uniform_seq=jnp.asarray(uniforms),
        )
    )
    S = OracleScene(scene)
    o_np, d_np = np.asarray(o), np.asarray(d)
    bgc = np.asarray(cam.background)
    want = np.stack(
        [
            get_color(
                S, o_np[i], d_np[i], depth, uniforms[:, i, :], bgc,
                sky_gradient=settings.sky_gradient,
            )
            for i in range(n_rays)
        ]
    )
    per_ray = (np.abs(got - want) / (1.0 + np.abs(want))).max(axis=1)
    bad = per_ray > 2e-3
    assert bad.mean() <= 0.02, (
        f"{name}: {bad.sum()}/{n_rays} rays disagree; worst {per_ray.max():.4f}"
    )
    img_got = got.reshape(n_pix, spp, 3).mean(axis=1)
    img_want = want.reshape(n_pix, spp, 3).mean(axis=1)
    # Pixel means, excluding pixels containing an allowed knife-edge ray
    # (already accounted for above; at tiny spp they don't dilute).
    clean = ~bad.reshape(n_pix, spp).any(axis=1)
    assert clean.mean() > 0.95
    np.testing.assert_allclose(img_got[clean], img_want[clean], rtol=2e-2, atol=2e-2)


def test_getcolor_oracle_deep_glass():
    """Rays aimed into the hollow-glass sphere: exercises TIR, the Schlick
    coin on both sides, and front/back-face eta flips over many bounces."""
    b = SceneBuilder(0)
    b.add_sphere((0, -100.5, 0), 100.0, b.lambertian((0.5, 0.5, 0.5)))
    glass = b.dielectric(1.5)
    b.add_sphere((0, 0.5, 0), 0.5, glass)
    b.add_sphere((0, 0.5, 0), -0.4, glass)
    b.add_sphere((0, 0.5, -2), 0.5, b.metal((0.9, 0.8, 0.7), 0.1))
    scene = b.build()

    cam, settings = make_camera(
        1.0, 8, samples_per_pixel=1, max_depth=12, background=(0.7, 0.8, 1.0),
        look_from=(0, 0.5, 2), look_at=(0, 0.5, 0), fov_degrees=30,
    )
    rng = np.random.default_rng(3)
    n_rays = 64
    w = settings.width
    pix = rng.integers(0, w * w, n_rays).astype(np.int32)
    cam_uni = rng.random((n_rays, 4), np.float32)
    frame = camera_frame(cam, w, w)
    o, d = camera_rays(frame, jnp.asarray(pix % w), jnp.asarray(pix // w), jnp.asarray(cam_uni))
    uniforms = rng.random((12, n_rays, 3), np.float32)
    got = np.asarray(
        trace(
            scene, o, d, jax.random.PRNGKey(0),
            jnp.asarray((0.7, 0.8, 1.0), jnp.float32),
            max_depth=12, uniform_seq=jnp.asarray(uniforms),
        )
    )
    S = OracleScene(scene)
    o_np, d_np = np.asarray(o), np.asarray(d)
    want = np.stack(
        [
            get_color(S, o_np[i], d_np[i], 12, uniforms[:, i, :], (0.7, 0.8, 1.0))
            for i in range(n_rays)
        ]
    )
    err = (np.abs(got - want) / (1.0 + np.abs(want))).max(axis=1)
    bad = err > 2e-3
    assert bad.mean() <= 0.05, f"{bad.sum()}/{n_rays} rays disagree"
