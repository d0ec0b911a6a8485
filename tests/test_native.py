"""C++ native runtime vs the NumPy/JAX reference implementations."""

import numpy as np
import pytest

from raytracer_tpu import native
from raytracer_tpu.geometry.bvh import build_bvh, primitive_bounds
from raytracer_tpu.geometry.scene import SceneBuilder
from raytracer_tpu.imgio.image import read_ppm
from raytracer_tpu.render.postprocess import to_u8

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable (no toolchain)"
)


def _scene(rng, n=50):
    b = SceneBuilder(0)
    m = b.lambertian((0.5, 0.5, 0.5))
    for _ in range(n):
        b.add_sphere(rng.uniform(-6, 6, 3), rng.uniform(0.2, 1.2), m)
    for _ in range(8):
        b.add_quad(
            rng.uniform(-6, 6, 3), rng.uniform(-2, 2, 3), rng.uniform(-2, 2, 3), m
        )
    return b.build()


def test_bvh_native_matches_numpy(rng):
    scene = _scene(rng)
    ref = build_bvh(scene, leaf_size=4)
    bmin, bmax = primitive_bounds(scene)
    out = native.build_bvh_native(bmin, bmax, leaf_size=4)
    assert out is not None
    box_min, box_max, skip, lstart, lcount, order = out
    np.testing.assert_array_equal(skip, np.asarray(ref.skip))
    np.testing.assert_array_equal(lstart, np.asarray(ref.leaf_start))
    np.testing.assert_array_equal(lcount, np.asarray(ref.leaf_count))
    np.testing.assert_array_equal(order, np.asarray(ref.prim_order))
    np.testing.assert_allclose(box_min, np.asarray(ref.box_min), rtol=1e-6)
    np.testing.assert_allclose(box_max, np.asarray(ref.box_max), rtol=1e-6)


def test_tonemap_native_matches_jax(rng):
    rgb = rng.uniform(0, 2, (37, 23, 3)).astype(np.float32)
    got = native.tonemap_native(rgb)
    want = np.asarray(to_u8(rgb))
    np.testing.assert_array_equal(got, want)


def test_ppm_native_roundtrip(tmp_path, rng):
    img = rng.integers(0, 256, (9, 7, 3), dtype=np.uint8)
    p = str(tmp_path / "native.ppm")
    assert native.write_ppm_native(p, img)
    np.testing.assert_array_equal(read_ppm(p), img)


def test_ppm_native_matches_python(tmp_path, rng):
    """Native and Python PPM encoders produce identical bytes."""
    import raytracer_tpu.imgio.image as im

    img = rng.integers(0, 256, (11, 13, 3), dtype=np.uint8)
    p_native = str(tmp_path / "a.ppm")
    assert native.write_ppm_native(p_native, img)
    # Force the pure-python writer by disabling the native path.
    p_py = str(tmp_path / "b.ppm")
    orig = native.write_ppm_native
    try:
        native.write_ppm_native = lambda *a, **k: False
        im.write_ppm(p_py, img)
    finally:
        native.write_ppm_native = orig
    assert open(p_native, "rb").read() == open(p_py, "rb").read()
