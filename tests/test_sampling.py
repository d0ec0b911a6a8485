"""Distribution tests for the closed-form samplers that replace the
reference's rejection loops (vec3.go:174-210). Parity is distributional
(SURVEY.md §4), so we check the defining statistics."""

import numpy as np
import jax
import jax.numpy as jnp

from raytracer_tpu.core.sampling import (
    hemisphere_from_uniform,
    unit_disk_from_uniform,
    unit_sphere_from_uniform,
)


def _uniforms(n, d, seed=0):
    return jax.random.uniform(jax.random.PRNGKey(seed), (n, d), jnp.float32)


def test_unit_sphere_is_unit_and_uniform():
    v = np.asarray(unit_sphere_from_uniform(_uniforms(200_000, 2)))
    np.testing.assert_allclose(np.linalg.norm(v, axis=-1), 1.0, atol=1e-5)
    # Uniform on the sphere: each coordinate has mean 0, var 1/3.
    np.testing.assert_allclose(v.mean(0), 0.0, atol=0.01)
    np.testing.assert_allclose(v.var(0), 1 / 3, atol=0.01)
    # z uniform in [-1, 1]: check CDF at a few quantiles.
    z = v[:, 2]
    for q in (-0.5, 0.0, 0.5):
        np.testing.assert_allclose((z < q).mean(), (q + 1) / 2, atol=0.01)


def test_hemisphere_faces_normal():
    n = jnp.array([[0.0, 1.0, 0.0]] * 1000)
    v = np.asarray(hemisphere_from_uniform(_uniforms(1000, 2), n))
    assert (v[:, 1] >= 0).all()
    np.testing.assert_allclose(np.linalg.norm(v, axis=-1), 1.0, atol=1e-5)


def test_unit_disk_uniform():
    d = np.asarray(unit_disk_from_uniform(_uniforms(200_000, 2)))
    r = np.linalg.norm(d, axis=-1)
    assert (r <= 1.0 + 1e-6).all()
    # Uniform over the disk: P(r < q) = q^2; E[r] = 2/3.
    for q in (0.25, 0.5, 0.75):
        np.testing.assert_allclose((r < q).mean(), q * q, atol=0.01)
    np.testing.assert_allclose(r.mean(), 2 / 3, atol=0.01)


def test_samplers_differentiable():
    # Reparameterization: gradients flow through the sample w.r.t. nothing here,
    # but the maps themselves must be smooth in u (no NaN from sqrt at edges).
    g = jax.jacfwd(lambda u: unit_sphere_from_uniform(u))(
        jnp.array([0.3, 0.7], jnp.float32)
    )
    assert np.isfinite(np.asarray(g)).all()
