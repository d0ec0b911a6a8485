"""Checkpoint/resume determinism: interrupted + resumed == uninterrupted."""

import numpy as np

from raytracer_tpu.core.camera import make_camera
from raytracer_tpu.geometry.scene import SceneBuilder
from raytracer_tpu.render.checkpoint import (
    load_checkpoint,
    render_with_checkpoints,
)


def _setup():
    b = SceneBuilder(0)
    b.add_sphere((0, 0, -3), 1.0, b.lambertian((0.6, 0.3, 0.2)))
    b.add_sphere((0, -101, -3), 100.0, b.metal((0.8, 0.8, 0.8), 0.2))
    cam, settings = make_camera(
        16 / 9, 40, samples_per_pixel=8, max_depth=5, background=(0.7, 0.8, 1.0)
    )
    return b.build(), cam, settings


def test_resume_is_bit_identical(tmp_path):
    scene, cam, settings = _setup()
    ckpt = str(tmp_path / "render.ckpt.npz")

    full = np.asarray(
        render_with_checkpoints(scene, cam, settings, seed=3, spp_per_chunk=2)
    )

    # Interrupt after 2 chunks (4/8 spp), then resume.
    partial = np.asarray(
        render_with_checkpoints(
            scene, cam, settings, seed=3, spp_per_chunk=2,
            checkpoint_path=ckpt, max_chunks=2,
        )
    )
    ck = load_checkpoint(ckpt)
    assert ck is not None and ck.done_spp == 4
    assert np.isfinite(partial).all()

    resumed = np.asarray(
        render_with_checkpoints(
            scene, cam, settings, seed=3, spp_per_chunk=2, checkpoint_path=ckpt
        )
    )
    np.testing.assert_array_equal(resumed, full)
    ck = load_checkpoint(ckpt)
    assert ck.done_spp == 8


def test_mismatched_config_refuses(tmp_path):
    """Resuming under a different seed/scene/settings must refuse loudly —
    silently blending inconsistent accumulations was the round-1 advisor
    finding (checkpoint.py config_fingerprint)."""
    import pytest

    scene, cam, settings = _setup()
    ckpt = str(tmp_path / "render.ckpt.npz")
    render_with_checkpoints(
        scene, cam, settings, seed=1, spp_per_chunk=2, checkpoint_path=ckpt,
        max_chunks=1,
    )
    with pytest.raises(ValueError, match="different scene/camera"):
        render_with_checkpoints(
            scene, cam, settings, seed=2, spp_per_chunk=2, checkpoint_path=ckpt
        )
    # Different spp_per_chunk (changes the chunk PRNG schedule) also refuses.
    with pytest.raises(ValueError, match="different scene/camera"):
        render_with_checkpoints(
            scene, cam, settings, seed=1, spp_per_chunk=4, checkpoint_path=ckpt
        )


def test_static_scene_flag_change_refuses(tmp_path):
    """Static Scene fields (pytree_node=False, e.g. bilinear_textures) also
    determine the image; the fingerprint hashes the treedef so toggling one
    refuses the resume instead of silently blending two filtering modes."""
    import pytest

    b = SceneBuilder(0)
    img = (np.arange(12, dtype=np.float32).reshape(2, 2, 3) % 3) / 3.0
    b.add_sphere((0, 0, -3), 1.0, b.lambertian(b.image(img)))
    cam, settings = make_camera(16 / 9, 40, samples_per_pixel=4, max_depth=3,
                                background=(0.7, 0.8, 1.0))
    ckpt = str(tmp_path / "r.npz")
    render_with_checkpoints(
        b.build(bilinear_textures=False), cam, settings, seed=0,
        spp_per_chunk=2, checkpoint_path=ckpt, max_chunks=1,
    )
    with pytest.raises(ValueError, match="refusing to resume"):
        render_with_checkpoints(
            b.build(bilinear_textures=True), cam, settings, seed=0,
            spp_per_chunk=2, checkpoint_path=ckpt,
        )


def test_version_mismatch_raises(tmp_path):
    """An old-version checkpoint must refuse loudly, not silently restart
    from 0 spp and clobber the file."""
    import pytest

    scene, cam, settings = _setup()
    ckpt = str(tmp_path / "r.npz")
    render_with_checkpoints(
        scene, cam, settings, seed=0, spp_per_chunk=2,
        checkpoint_path=ckpt, max_chunks=1,
    )
    with np.load(ckpt) as z:
        data = dict(z)
    data["version"] = np.array(data["version"]) + 1
    np.savez(ckpt, **data)
    with pytest.raises(ValueError, match="version"):
        load_checkpoint(ckpt)
