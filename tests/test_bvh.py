"""BVH builder + stackless traversal vs the dense brute-force search
(SURVEY.md §4.2: oracle tests — same hits to fp tolerance)."""

import numpy as np
import jax.numpy as jnp

from raytracer_tpu.geometry.bvh import build_bvh, bvh_closest_hit, primitive_bounds
from raytracer_tpu.geometry.intersect import intersect_scene
from raytracer_tpu.geometry.scene import SceneBuilder
from raytracer_tpu.scenes.registry import get_scene


def _random_scene(rng, n_spheres=40, n_quads=10):
    b = SceneBuilder(0)
    m = b.lambertian((0.5, 0.5, 0.5))
    for _ in range(n_spheres):
        b.add_sphere(rng.uniform(-6, 6, 3), rng.uniform(0.2, 1.2), m)
    for _ in range(n_quads):
        b.add_quad(
            rng.uniform(-6, 6, 3), rng.uniform(-2, 2, 3), rng.uniform(-2, 2, 3), m
        )
    return b.build()


def test_bounds_match_reference_semantics():
    b = SceneBuilder(0)
    m = b.lambertian((1, 1, 1))
    b.add_sphere((1, 2, 3), -0.5, m)  # negative radius: bounds use |r|
    b.add_quad((0, 0, 0), (1, 0, 0), (0, 1, 0), m)  # z-degenerate: padded
    scene = b.build()
    bmin, bmax = primitive_bounds(scene)
    np.testing.assert_allclose(bmin[0], [0.5, 1.5, 2.5])
    np.testing.assert_allclose(bmax[0], [1.5, 2.5, 3.5])
    assert bmax[1][2] - bmin[1][2] >= 2e-4  # padded thin axis (bvh.go:63-82)


def test_bvh_structure(rng):
    scene = _random_scene(rng)
    bvh = build_bvh(scene, leaf_size=4)
    skip = np.asarray(bvh.skip)
    start = np.asarray(bvh.leaf_start)
    count = np.asarray(bvh.leaf_count)
    m = len(skip)
    assert (skip > np.arange(m)).all() and (skip <= m).all()
    # Every valid primitive appears exactly once across leaves.
    order = np.asarray(bvh.prim_order)
    assert sorted(order) == sorted(set(order))
    assert count[start >= 0].sum() == len(order)


def test_traversal_matches_dense(rng):
    scene = _random_scene(rng)
    bvh = build_bvh(scene)
    n = 512
    o = rng.uniform(-8, 8, (n, 3)).astype(np.float32)
    target = rng.uniform(-5, 5, (n, 3)).astype(np.float32)
    d = (target - o).astype(np.float32)

    t_b, p_b = bvh_closest_hit(scene, bvh, jnp.asarray(o), jnp.asarray(d))
    ref = intersect_scene(scene, jnp.asarray(o), jnp.asarray(d))

    t_b = np.asarray(t_b)
    p_b = np.asarray(p_b)
    hit_r = np.asarray(ref.hit)
    assert (np.isfinite(t_b) == hit_r).mean() > 0.995
    both = np.isfinite(t_b) & hit_r
    assert both.sum() > 150
    close = np.isclose(t_b[both], np.asarray(ref.t)[both], rtol=2e-4, atol=1e-5)
    assert close.mean() > 0.995  # fp-order ties excluded


def test_traversal_on_reference_scene():
    scene, _, _ = get_scene("cornell", width=32, spp=1)
    bvh = build_bvh(scene)
    rng = np.random.default_rng(0)
    n = 256
    o = np.tile(np.array([[278, 278, -800]], np.float32), (n, 1))
    target = rng.uniform([0, 0, 0], [555, 555, 555], (n, 3)).astype(np.float32)
    d = target - o
    t_b, p_b = bvh_closest_hit(scene, bvh, jnp.asarray(o), jnp.asarray(d))
    ref = intersect_scene(scene, jnp.asarray(o), jnp.asarray(d))
    assert bool(np.asarray(ref.hit).all())  # box interior: everything hits
    np.testing.assert_allclose(
        np.asarray(t_b), np.asarray(ref.t), rtol=2e-4, atol=1e-4
    )
    np.testing.assert_array_equal(np.asarray(p_b), np.asarray(ref.prim_id))
