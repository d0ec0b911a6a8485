"""Property fuzz: random scenes, wavefront vs scalar oracle per ray.

test_getcolor_oracle pins a fixed material/texture zoo; this file generates
RANDOM small scenes (geometry, materials, textures, camera all drawn from a
seeded generator) and requires the wavefront integrator to match the scalar
NumPy oracle per ray under shared injected uniforms — covering interaction
combinations no hand-built scene enumerates (overlapping glass, negative
radii inside quads, emissive metal-adjacent corners, degenerate-thin quads,
off-axis cameras...). Any mismatch reproduces deterministically from the
case seed.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from raytracer_tpu.core.camera import camera_frame, camera_rays, make_camera
from raytracer_tpu.geometry.scene import SceneBuilder
from raytracer_tpu.integrator.wavefront import trace

from oracle import OracleScene, get_color, make_fast_hit

DEPTH = 8
N_RAYS = 96


def _random_scene(rng):
    b = SceneBuilder(int(rng.integers(1 << 30)))

    def random_texture():
        kind = rng.integers(4)
        if kind == 0:
            return tuple(rng.uniform(0.05, 0.95, 3))
        if kind == 1:
            return b.checker(rng.uniform(0.2, 2.0), rng.uniform(0, 1, 3), rng.uniform(0, 1, 3))
        if kind == 2:
            img = rng.uniform(0.0, 1.0, (int(rng.integers(2, 9)), int(rng.integers(2, 17)), 3))
            return b.image(img.astype(np.float32))
        return b.noise(rng.uniform(0.5, 5.0))

    def random_material():
        kind = rng.integers(4)
        if kind == 0:
            return b.lambertian(random_texture())
        if kind == 1:
            return b.metal(tuple(rng.uniform(0.3, 1.0, 3)), rng.uniform(0.0, 0.8))
        if kind == 2:
            return b.dielectric(rng.uniform(1.1, 2.4))
        return b.diffuse_light(random_texture())

    for _ in range(int(rng.integers(2, 7))):
        c = rng.uniform(-3, 3, 3)
        r = rng.uniform(0.2, 1.5) * (1 if rng.random() < 0.85 else -0.6)
        b.add_sphere(tuple(c), float(r), random_material())
    for _ in range(int(rng.integers(0, 4))):
        q = rng.uniform(-3, 3, 3)
        u = rng.uniform(-2, 2, 3) * (0.02 if rng.random() < 0.1 else 1.0)  # some near-degenerate
        v = rng.uniform(-2, 2, 3)
        b.add_quad(tuple(q), tuple(u), tuple(v), random_material())
    scene = b.build()

    cam, settings = make_camera(
        rng.choice([1.0, 16.0 / 9.0]),
        16,
        samples_per_pixel=1,
        max_depth=DEPTH,
        background=tuple(rng.uniform(0, 1, 3)) if rng.random() < 0.7 else (0, 0, 0),
        look_from=tuple(rng.uniform(-8, 8, 3)),
        look_at=tuple(rng.uniform(-1, 1, 3)),
        fov_degrees=float(rng.uniform(25, 90)),
        defocus_angle_degrees=float(rng.uniform(0, 1.5)) if rng.random() < 0.4 else 0.0,
        focus_dist=float(rng.uniform(4, 10)),
    )
    return scene, cam, settings


@pytest.mark.parametrize("case_seed", range(8))
def test_fuzz_random_scene_vs_oracle(case_seed):
    rng = np.random.default_rng(7700 + case_seed)
    scene, cam, settings = _random_scene(rng)
    w = settings.width
    h = settings.height

    pix = rng.integers(0, w * h, N_RAYS).astype(np.int32)
    cam_uni = rng.random((N_RAYS, 4), np.float32)
    frame = camera_frame(cam, w, h)
    o, d = camera_rays(
        frame, jnp.asarray(pix % w), jnp.asarray(pix // w), jnp.asarray(cam_uni)
    )
    uniforms = rng.random((DEPTH, N_RAYS, 3), np.float32)
    bg = np.asarray(cam.background, np.float32)

    got = np.asarray(
        trace(
            scene, o, d, jax.random.PRNGKey(0), jnp.asarray(bg),
            max_depth=DEPTH, sky_gradient=False,
            uniform_seq=jnp.asarray(uniforms),
        )
    )
    S = OracleScene(scene)
    fast = make_fast_hit(S)
    o_np, d_np = np.asarray(o), np.asarray(d)
    want = np.stack([
        get_color(S, o_np[i], d_np[i], DEPTH, uniforms[:, i, :], bg, hit_fn=fast)
        for i in range(N_RAYS)
    ])

    err = np.abs(got - want) / (1.0 + np.abs(want))
    per_ray = err.max(axis=1)
    # Random scenes graze more often than the curated zoo: allow a few
    # f32-vs-f64 knife-edge rays, but the bulk must agree tightly and the
    # estimator mean must match.
    bad = per_ray > 2e-3
    assert bad.mean() <= 0.05, (
        f"case {case_seed}: {bad.sum()}/{N_RAYS} rays disagree; "
        f"worst {per_ray.max():.4f} at ray {per_ray.argmax()}"
    )
    matched = ~bad
    np.testing.assert_allclose(got[matched], want[matched], rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(got.mean(), want.mean(), rtol=1e-2, atol=5e-3)
