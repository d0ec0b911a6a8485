"""Cluster-culled intersect kernel vs the dense search (interpreter mode)."""

import numpy as np
import jax.numpy as jnp
import pytest

from raytracer_tpu.geometry.intersect import intersect_scene, quad_derived
from raytracer_tpu.geometry.scene import SceneBuilder
from raytracer_tpu.ops import culled_kernel as ck
from raytracer_tpu.ops import intersect_kernel as ik


def test_culled_matches_dense(rng, monkeypatch):
    import jax.experimental.pallas as pl

    b = SceneBuilder(0)
    m = b.lambertian((0.5, 0.5, 0.5))
    for _ in range(60):
        b.add_sphere(rng.uniform(-6, 6, 3), rng.uniform(0.2, 0.8), m)
    b.add_quad((-8, -8, -7), (16, 0, 0), (0, 16, 0), m)
    scene = b.build()
    cl, order, sph_cl, orig = ck.build_clusters(scene, max_leaf=8)
    assert cl.shape[0] >= 4  # actually clustered
    qt = ik.pack_quad_table(quad_derived(scene))

    n = 8 * 128
    o = jnp.asarray(rng.uniform(-8, 8, (n, 3)).astype(np.float32))
    tgt = jnp.asarray(rng.uniform(-4, 4, (n, 3)).astype(np.float32))
    d = tgt - o
    # Natural ray order (the production fallback feeds pixel-ordered camera
    # rays; the round-2 sort_rays helper was deleted as unwired).
    perm = invp = jnp.arange(n)

    orig_call = pl.pallas_call
    monkeypatch.setattr(
        pl, "pallas_call", lambda *a, **k: orig_call(*a, **{**k, "interpret": True})
    )
    t_c, p_c = ck.intersect_pallas_culled(
        cl, order, sph_cl, orig, qt, scene.num_spheres, o[perm], d[perm], rows=8
    )
    t_c = np.asarray(t_c)[np.asarray(invp)]
    p_c = np.asarray(p_c)[np.asarray(invp)]

    ref = intersect_scene(scene, o, d)
    hit_r = np.asarray(ref.hit)
    assert (np.isfinite(t_c) == hit_r).mean() > 0.995
    both = np.isfinite(t_c) & hit_r
    assert both.sum() > 300
    close = np.isclose(t_c[both], np.asarray(ref.t)[both], rtol=2e-4, atol=1e-5)
    assert close.mean() > 0.99
    agree = (p_c[both] == np.asarray(ref.prim_id)[both]).mean()
    assert agree > 0.99


def test_axis_aligned_ray_on_cluster_plane_not_culled(monkeypatch):
    """Zero direction component + origin exactly on the cluster AABB plane.

    The slab test computes (bmin - o) * (1/d); with d==0 that is 0*inf = NaN,
    NaN comparisons are all-false, and before the fix a tile of such rays
    could falsely cull a cluster they hit (ADVICE round-1 finding)."""
    import jax.experimental.pallas as pl

    b = SceneBuilder(0)
    m = b.lambertian((0.5, 0.5, 0.5))
    # A few spheres so clustering produces >=1 real cluster; the target
    # sphere spans x in [-1, 1], so its cluster AABB has bmin_x == -1.
    b.add_sphere((0.0, 0.0, -5.0), 1.0, m)
    b.add_sphere((3.0, 0.0, -5.0), 0.5, m)
    b.add_sphere((-3.0, 0.0, -5.0), 0.5, m)
    scene = b.build()
    cl, order, sph_cl, orig = ck.build_clusters(scene, max_leaf=2)
    qt = ik.pack_quad_table(quad_derived(scene))

    # Whole tile is the SAME degenerate ray: dx = dy = 0 exactly, origin x
    # exactly on the cluster plane bmin_x (the padded AABB min is close to
    # -1; use the actual packed value so (bmin_x - ox) == 0 bit-exactly).
    bmin_x = float(np.asarray(cl).reshape(-1, 8)[:, 0].min())
    n = 1 * 128
    o = jnp.tile(jnp.asarray([[bmin_x, 0.0, 0.0]], jnp.float32), (n, 1))
    d = jnp.tile(jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32), (n, 1))

    orig_call = pl.pallas_call
    monkeypatch.setattr(
        pl, "pallas_call", lambda *a, **k: orig_call(*a, **{**k, "interpret": True})
    )
    t_c, p_c = ck.intersect_pallas_culled(
        cl, order, sph_cl, orig, qt, scene.num_spheres, o, d, rows=1
    )
    ref = intersect_scene(scene, o, d)
    hit_r = np.asarray(ref.hit)
    assert hit_r.all()  # the ray does hit the big sphere
    assert np.isfinite(np.asarray(t_c)).all()  # ...and the kernel agrees
    np.testing.assert_allclose(np.asarray(t_c), np.asarray(ref.t), rtol=2e-4)


