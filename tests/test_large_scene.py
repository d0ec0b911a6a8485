"""Large-scene path: culled camera intersector + dense-Pallas bounces
(render/driver._render_large_scene). Interpreter mode on CPU with a small
scene — the machinery is identical at any primitive count; the scene-size
switch itself is exercised by monkeypatching the threshold."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from raytracer_tpu.core.camera import make_camera
from raytracer_tpu.geometry.intersect import (
    build_large_scene_tables,
    intersect_scene,
    intersect_scene_culled,
    intersect_scene_pallas_tables,
)
from raytracer_tpu.geometry.scene import SceneBuilder


def _scene(n_spheres=40, seed=3):
    rng = np.random.default_rng(seed)
    b = SceneBuilder(0)
    m = b.lambertian((0.6, 0.5, 0.4))
    light = b.diffuse_light((2.0, 2.0, 2.0))
    for i in range(n_spheres):
        mat = light if i % 7 == 0 else m
        b.add_sphere(rng.uniform(-6, 6, 3), rng.uniform(0.3, 0.9), mat)
    b.add_quad((-8, -8, -7), (16, 0, 0), (0, 16, 0), m)
    return b.build()


def test_culled_hitrecord_matches_dense():
    """intersect_scene_culled returns the SAME HitRecord as the dense XLA
    reference (same t, prim, point, normal, material) — oracle exactness of
    the whole resolve pipeline, not just (t, prim)."""
    scene = _scene()
    tables = build_large_scene_tables(scene, max_leaf=8)
    rng = np.random.default_rng(0)
    n = 128 * 128  # one culled-kernel tile
    o = jnp.asarray(rng.uniform(-7, 7, (n, 3)).astype(np.float32))
    tgt = jnp.asarray(rng.uniform(-3, 3, (n, 3)).astype(np.float32))
    d = tgt - o
    with pltpu.force_tpu_interpret_mode():
        got = intersect_scene_culled(scene, tables, o, d)
        got_dense = intersect_scene_pallas_tables(scene, tables, o, d)
    want = intersect_scene(scene, o, d)
    for g in (got, got_dense):
        hm = np.asarray(g.hit) == np.asarray(want.hit)
        assert hm.mean() > 0.999  # float-order ties at tangents only
        both = np.asarray(g.hit) & np.asarray(want.hit) & hm
        np.testing.assert_allclose(
            np.asarray(g.t)[both], np.asarray(want.t)[both], rtol=1e-3, atol=1e-4
        )
        agree = (np.asarray(g.prim_id)[both] == np.asarray(want.prim_id)[both]).mean()
        assert agree > 0.999
        # Normals: tiny t shifts at grazing hits amplify into the normal —
        # require 99.9% within tolerance rather than every element.
        nclose = np.isclose(
            np.asarray(g.normal)[both], np.asarray(want.normal)[both],
            rtol=2e-3, atol=2e-4,
        ).all(axis=-1)
        assert nclose.mean() > 0.999


def test_render_image_large_scene_switch(monkeypatch):
    """With the threshold lowered, render_image takes the large-scene path;
    its image must statistically match the baseline pass renderer (same
    estimator, different RNG assignment)."""
    from raytracer_tpu.render import driver

    scene = _scene()
    cam, settings = make_camera(
        1.0, 24, samples_per_pixel=32, max_depth=6, background=(0.3, 0.4, 0.5),
        look_from=(0, 0, 14), look_at=(0, 0, 0), fov_degrees=50,
    )

    with pltpu.force_tpu_interpret_mode():
        monkeypatch.setattr(driver, "LARGE_SCENE_PRIMS", 4)
        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        large = np.asarray(
            driver._render_large_scene(scene, cam, settings, seed=0, progress=False)
        )
    base = np.asarray(
        driver.render_image(scene, cam, settings, seed=1, regenerative=False)
    )
    # Monte-Carlo agreement: channel means within a few std errors.
    np.testing.assert_allclose(large.mean((0, 1)), base.mean((0, 1)), rtol=0.05, atol=0.01)
    assert abs(float(large.std()) - float(base.std())) < 0.05


def test_render_large_scene_sharded_matches_baseline():
    """The sharded large-scene path (contiguous pixel-coherent ray blocks per
    device, culled camera intersector + dense bounces, one segment psum)
    matches the baseline renderer statistically on a 2-device mesh."""
    from raytracer_tpu.parallel.mesh import make_mesh
    from raytracer_tpu.parallel.shard import render_large_scene_sharded
    from raytracer_tpu.render import driver

    scene = _scene()
    cam, settings = make_camera(
        1.0, 24, samples_per_pixel=32, max_depth=6, background=(0.3, 0.4, 0.5),
        look_from=(0, 0, 14), look_at=(0, 0, 0), fov_degrees=50,
    )
    mesh = make_mesh(2)
    with pltpu.force_tpu_interpret_mode():
        img_s = np.asarray(
            render_large_scene_sharded(scene, cam, settings, mesh, seed=0)
        )
    base = np.asarray(
        driver.render_image(scene, cam, settings, seed=1, regenerative=False)
    )
    np.testing.assert_allclose(img_s.mean((0, 1)), base.mean((0, 1)), rtol=0.05, atol=0.01)
    assert abs(float(img_s.std()) - float(base.std())) < 0.05
