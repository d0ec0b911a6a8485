"""All registered scenes build and render; coarse radiometric sanity."""

import numpy as np
import pytest

from raytracer_tpu.render.driver import render_scene
from raytracer_tpu.scenes.registry import SCENES, get_scene

SMALL = dict(width=64, spp=4, max_depth=6)


@pytest.mark.parametrize("name", sorted(SCENES))
def test_scene_renders(name):
    scene, cam, settings = get_scene(name, **SMALL)
    img = render_scene(scene, cam, settings)
    assert img.shape[2] == 3 and img.dtype == np.uint8
    assert img.max() > 10  # not all-black
    if name in ("simple_light", "cornell"):
        # Black-background scenes are mostly dark with a bright light.
        assert img.max() > 200
    else:
        assert img.mean() > 60  # sky-lit


def test_rand_spheres_composition():
    scene, _, _ = get_scene("rand_spheres", **SMALL)
    # main.go:249-276: ~22*22 grid minus the hero-exclusion zone + ground + 3.
    assert 400 < scene.num_spheres < 489
    from raytracer_tpu.geometry.scene import DIELECTRIC, LAMBERTIAN, METAL

    types = np.asarray(scene.mat_type)
    # Distribution: 80% lambertian / 15% metal / 5% glass (main.go:259-272).
    n = len(types)
    assert 0.6 < (types == LAMBERTIAN).mean() < 0.95
    assert (types == METAL).sum() > 10
    assert (types == DIELECTRIC).sum() >= 2


def test_scene_determinism():
    a, _, _ = get_scene("rand_spheres", seed=5, **SMALL)
    b, _, _ = get_scene("rand_spheres", seed=5, **SMALL)
    np.testing.assert_array_equal(np.asarray(a.sph_center), np.asarray(b.sph_center))
    c, _, _ = get_scene("rand_spheres", seed=6, **SMALL)
    assert not np.array_equal(np.asarray(a.sph_center), np.asarray(c.sph_center))


def test_cornell_geometry():
    scene, cam, settings = get_scene("cornell", **SMALL)
    assert scene.num_quads == 6 + 12  # walls + two boxes (main.go:206-222)
    assert settings.width == settings.height  # aspect 1
