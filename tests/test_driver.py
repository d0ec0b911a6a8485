"""Render driver + postprocess + image I/O."""

import numpy as np
import jax.numpy as jnp

from raytracer_tpu.core.camera import make_camera
from raytracer_tpu.geometry.scene import SceneBuilder
from raytracer_tpu.imgio.image import read_ppm, write_ppm
from raytracer_tpu.render.driver import render_image, render_scene, samples_per_pass_for
from raytracer_tpu.render.postprocess import to_u8


def test_samples_per_pass_divides_spp():
    assert samples_per_pass_for(500, 90_000, 1 << 20) == 10
    assert samples_per_pass_for(100, 90_000, 1 << 20) == 10
    assert samples_per_pass_for(7, 1000, 1 << 20) == 7
    assert samples_per_pass_for(13, 10**9, 1 << 20) == 1


def test_postprocess_matches_reference_pipeline():
    # camera.go:212-215: gamma2 (sqrt) -> clamp -> *255.999 -> int truncate.
    lin = jnp.array([[[0.0, 0.25, 1.0], [4.0, 0.5, 0.0081]]])
    got = np.asarray(to_u8(lin))
    want = np.floor(np.clip(np.sqrt([[0.0, 0.25, 1.0], [4.0, 0.5, 0.0081]]), 0, 1) * 255.999)
    np.testing.assert_array_equal(got[0], want.astype(np.uint8))


def test_ppm_roundtrip(tmp_path, rng):
    img = rng.integers(0, 256, (7, 5, 3), dtype=np.uint8)
    p = str(tmp_path / "img.ppm")
    write_ppm(p, img)
    with open(p) as f:
        head = f.read(20)
    assert head.startswith("P3\n5 7\n255\n")
    np.testing.assert_array_equal(read_ppm(p), img)


def _tiny_scene():
    b = SceneBuilder(0)
    b.add_sphere((0, 0, -3), 1.0, b.lambertian((0.5, 0.5, 0.5)))
    b.add_sphere((0, -101, -3), 100.0, b.lambertian((0.3, 0.6, 0.3)))
    cam, settings = make_camera(
        16 / 9, 48, samples_per_pixel=8, max_depth=6, background=(0.7, 0.8, 1.0)
    )
    return b.build(), cam, settings


def test_render_deterministic_and_pass_split_invariant():
    scene, cam, settings = _tiny_scene()
    a = render_image(scene, cam, settings, seed=3)
    b = render_image(scene, cam, settings, seed=3)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c = render_image(scene, cam, settings, seed=4)
    assert np.abs(np.asarray(a) - np.asarray(c)).max() > 0  # seed matters
    # Same spp split into different pass sizes: different sample keys, but the
    # converged means must agree statistically.
    d = render_image(scene, cam, settings, seed=3, target_rays_per_pass=48 * 27 * 2)
    assert np.abs(np.asarray(a) - np.asarray(d)).mean() < 0.15


def test_render_scene_shape_dtype():
    scene, cam, settings = _tiny_scene()
    img = render_scene(scene, cam, settings)
    assert img.shape == (settings.height, settings.width, 3)
    assert img.dtype == np.uint8


def test_render_metrics_wired():
    """The driver feeds RenderMetrics: spp progress, traced segments,
    iterations, and occupancy (SURVEY.md §5 observability; the reference's
    only analog is a per-scanline Printf, camera.go:203)."""
    from raytracer_tpu.utils.metrics import RenderMetrics

    scene, cam, settings = _tiny_scene()
    m = RenderMetrics(
        total_spp=settings.samples_per_pixel,
        pixels=settings.width * settings.height,
    )
    render_image(scene, cam, settings, seed=1, metrics=m)
    assert m.done_spp == settings.samples_per_pixel
    assert m.traced_segments > 0
    assert m.wavefront_iters > 0
    assert m.wavefront_lanes > 0
    snap = m.snapshot()
    assert 0.0 < snap["occupancy"] <= 1.0
    assert snap["traced_mrays_per_s"] > 0
    # Metrics must not change the image (same compiled estimator).
    plain = render_image(scene, cam, settings, seed=1)
    with_m = render_image(scene, cam, settings, seed=1, metrics=RenderMetrics(1, 1))
    np.testing.assert_array_equal(np.asarray(plain), np.asarray(with_m))


def test_device_memory_stats_shape():
    from raytracer_tpu.utils.metrics import device_memory_stats

    stats = device_memory_stats()  # CPU backend may return {}
    assert isinstance(stats, dict)
    for v in stats.values():
        assert v >= 0


def test_regen_slot_cap_scoped_to_persistent_kernel():
    """The 40-slot noise cap is a persistent-kernel VMEM constraint; the
    megakernel/XLA paths must keep 64 (sixth-review finding: the two copies
    of this rule in driver/shard had diverged)."""
    from raytracer_tpu.render.driver import regen_max_slots, regen_spp_chunk

    assert regen_max_slots(use_persistent=True, has_noise=True) == 40
    assert regen_max_slots(use_persistent=True, has_noise=False) == 64
    assert regen_max_slots(use_persistent=False, has_noise=True) == 64
    assert regen_max_slots(use_persistent=False, has_noise=False) == 64
    # VMEM-aware: big resolve tables / image tables shrink the slot budget
    # (50K prims -> ~5.6 MB double-buffered resolve table).
    assert regen_max_slots(True, False, n_prims=50000) < 64
    assert regen_max_slots(True, False, n_prims=50000) >= 4
    assert regen_max_slots(True, False, img_texels=256 * 512) == 64
    # The VMEM model follows the ACTUAL tile height (round-3 VERDICT weak
    # #6): halving rows halves the per-slot log cost, so a constrained
    # budget affords at least as many slots; doubling rows affords fewer.
    tight = dict(n_prims=50000, img_texels=256 * 512)
    assert regen_max_slots(True, False, rows=32, **tight) >= regen_max_slots(
        True, False, rows=64, **tight
    )
    assert regen_max_slots(True, False, rows=128, **tight) <= regen_max_slots(
        True, False, rows=64, **tight
    )
    # rows=0 means DEFAULT_ROWS: identical to the explicit default.
    assert regen_max_slots(True, True, rows=0) == regen_max_slots(
        True, True, rows=64
    )
    # Divisor preference: one executable serves every chunk.
    assert regen_spp_chunk(500, 90000, 1 << 19, 64) == 250
    # Multi-device form bounds the per-device ceil share.
    assert regen_spp_chunk(64, 90000, 1 << 19, 64, n_dev=8) == 64
