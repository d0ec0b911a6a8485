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
    perm, invp = ck.sort_rays(
        o, d, jnp.asarray([-8.0, -8.0, -8.0]), jnp.asarray([1 / 16.0] * 3)
    )

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


def test_sort_rays_groups_by_key(rng):
    n = 1024
    o = jnp.asarray(rng.uniform(0, 1, (n, 3)).astype(np.float32))
    d = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
    perm, inv = ck.sort_rays(o, d, jnp.zeros(3), jnp.ones(3))
    # inv is the inverse permutation.
    np.testing.assert_array_equal(np.asarray(perm)[np.asarray(inv)], np.arange(n))
    # Octants are contiguous after sorting.
    ds = np.asarray(d)[np.asarray(perm)]
    octant = (ds[:, 0] > 0) + 2 * (ds[:, 1] > 0) + 4 * (ds[:, 2] > 0)
    assert (np.diff(octant) >= 0).all()
