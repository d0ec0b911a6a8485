"""ops/invtrig.py accuracy vs numpy (the Mosaic-compatible atan/atan2/acos
used by the persistent kernel's image-texture UV path)."""

import numpy as np
import jax.numpy as jnp

from raytracer_tpu.ops import invtrig


def test_atan_dense_grid():
    x = np.concatenate(
        [
            np.linspace(-50.0, 50.0, 20001, dtype=np.float32),
            np.linspace(-1.5, 1.5, 10001, dtype=np.float32),
            np.array([0.0, -0.0, 1e-30, -1e-30, 1e30, -1e30], np.float32),
        ]
    )
    got = np.asarray(invtrig.atan(jnp.asarray(x)))
    np.testing.assert_allclose(got, np.arctan(x), rtol=0, atol=2e-6)


def test_atan2_quadrants_and_edges():
    ys = np.array([0.0, -0.0, 1.0, -1.0, 0.5, -0.5, 1e-20, -1e-20], np.float32)
    xs = np.array([0.0, 1.0, -1.0, 0.3, -0.3, 1e-20, -1e-20, 2.0], np.float32)
    Y, X = np.meshgrid(ys, xs)
    got = np.asarray(invtrig.atan2(jnp.asarray(Y), jnp.asarray(X)))
    np.testing.assert_allclose(got, np.arctan2(Y, X), rtol=0, atol=2e-6)


def test_atan2_zero_x_tiny_y():
    """x == 0 exactly with subnormal-scale y: the 1e-30-substitute trick alone
    would return ~y*1e30 instead of +-pi/2 (ADVICE r2); the explicit select
    must restore the IEEE contract for every nonzero y."""
    # (smallest NORMAL f32, not 1e-38: XLA flushes subnormals to zero, where
    # atan2(0, 0) = 0 is the documented behavior)
    tiny = np.float32(1.1754944e-38)
    ys = np.array([1e-30, -1e-30, tiny, -tiny, 2.4e-30, -2.4e-30], np.float32)
    xs = np.zeros_like(ys)
    got = np.asarray(invtrig.atan2(jnp.asarray(ys), jnp.asarray(xs)))
    np.testing.assert_allclose(got, np.arctan2(ys, xs), rtol=0, atol=2e-6)


def test_atan2_unit_circle():
    """The actual use: atan2 over unit-normal components."""
    t = np.linspace(0.0, 2 * np.pi, 4096, endpoint=False).astype(np.float32)
    y, x = np.sin(t), np.cos(t)
    got = np.asarray(invtrig.atan2(jnp.asarray(y), jnp.asarray(x)))
    np.testing.assert_allclose(got, np.arctan2(y, x), rtol=0, atol=2e-6)


def test_acos():
    x = np.linspace(-1.0, 1.0, 20001, dtype=np.float32)
    got = np.asarray(invtrig.acos(jnp.asarray(x)))
    np.testing.assert_allclose(got, np.arccos(x), rtol=0, atol=3e-6)
