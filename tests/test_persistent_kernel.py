"""Persistent megakernel (ops/persistent_kernel.py) correctness tests.

Interpreter mode on CPU. The interpreter stubs the hardware PRNG to zeros, so
distribution checks live in the TPU self-check script
(scripts/check_persistent_tpu.py); here we use *exact* invariants that hold
for any uniforms:

* miss-only scene: every sample retires background radiance exactly once, so
  the folded framebuffer is exactly spp * background per pixel — this pins
  the whole regeneration / strided-queue / retirement / fold pipeline.
* full-frame emitter: every camera ray hits the light and terminates, so the
  framebuffer is exactly spp * emit.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from raytracer_tpu.core.camera import camera_frame, make_camera
from raytracer_tpu.geometry.scene import SceneBuilder
from raytracer_tpu.integrator.wavefront import render_wavefront_regen


def _render_persistent(scene, cam, settings, spp, wavefront, **kw):
    frame = camera_frame(cam, settings.width, settings.height)
    ctx = pltpu.force_tpu_interpret_mode()
    ctx.__enter__()
    try:
        out = render_wavefront_regen(
            scene,
            frame,
            cam.background,
            width=settings.width,
            height=settings.height,
            spp=spp,
            wavefront_size=wavefront,
            key=jax.random.PRNGKey(3),
            max_depth=settings.max_depth,
            use_persistent=True,
            return_stats=True,
            **kw,
        )
        out = jax.tree_util.tree_map(np.asarray, out)
    finally:
        ctx.__exit__(None, None, None)
    return out


def test_persistent_miss_only_exact_accounting():
    """No geometry: every sample = background, retired exactly once."""
    b = SceneBuilder(0)
    b.lambertian((0.5, 0.5, 0.5))  # unused material so tables are non-empty
    scene = b.build()
    cam, settings = make_camera(
        1.0, 16, samples_per_pixel=5, max_depth=8, background=(0.2, 0.4, 0.6),
        look_from=(0, 0, 2), look_at=(0, 0, 0),
    )
    spp = 5
    fb, segs, iters = _render_persistent(scene, cam, settings, spp, 1024)
    n_pix = settings.width * settings.height
    # Every camera ray misses -> one segment per sample.
    assert int(segs) == n_pix * spp, (int(segs), n_pix * spp)
    expect = np.tile(np.array([0.2, 0.4, 0.6], np.float32) * spp, (n_pix, 1))
    np.testing.assert_allclose(fb, expect, rtol=1e-5, atol=1e-5)
    assert int(iters) > 0


def test_persistent_emitter_exact():
    """A huge emissive sphere around the camera: every ray hits, emits,
    terminates. Framebuffer == spp * emit exactly."""
    b = SceneBuilder(0)
    light = b.diffuse_light((3.0, 2.0, 1.0))
    b.add_sphere((0, 0, 0), 100.0, light)
    scene = b.build()
    cam, settings = make_camera(
        1.0, 8, samples_per_pixel=3, max_depth=8, background=(9, 9, 9),
        look_from=(0, 0, 0), look_at=(0, 0, -1),
    )
    spp = 3
    fb, segs, iters = _render_persistent(scene, cam, settings, spp, 1024)
    n_pix = settings.width * settings.height
    assert int(segs) == n_pix * spp
    expect = np.tile(np.array([3.0, 2.0, 1.0], np.float32) * spp, (n_pix, 1))
    np.testing.assert_allclose(fb, expect, rtol=1e-5, atol=1e-5)


def test_persistent_matches_intersection_oracle():
    """Random solid/checker scene: the kernel's own camera rays and winning
    hits must agree with the jnp dense intersector on a one-bounce render.

    With zero uniforms (interpreter PRNG stub), camera rays are deterministic
    (pixel corner, no defocus), so we can re-derive them and check the t of
    the first bounce indirectly: a 1-depth render of a pure-emitter scene
    equals emitted-where-hit + bg-where-miss, which exercises sphere AND quad
    intersection + front-face logic in the kernel against the jnp oracle."""
    from raytracer_tpu.core.camera import camera_rays
    from raytracer_tpu.geometry.intersect import intersect_scene

    rng = np.random.default_rng(7)
    b = SceneBuilder(0)
    light = b.diffuse_light((1.0, 0.5, 0.25))
    for _ in range(12):
        b.add_sphere(rng.uniform(-4, 4, 3), rng.uniform(0.4, 1.2), light)
    for _ in range(5):
        b.add_quad(
            rng.uniform(-4, 4, 3), rng.uniform(-2, 2, 3), rng.uniform(-2, 2, 3), light
        )
    scene = b.build()
    w = 16
    cam, settings = make_camera(
        1.0, w, samples_per_pixel=1, max_depth=4, background=(0.1, 0.2, 0.3),
        look_from=(0, 0, 10), look_at=(0, 0, 0), fov_degrees=45,
    )
    fb, segs, iters = _render_persistent(scene, cam, settings, 1, 1024)

    # Re-derive the kernel's deterministic camera rays: zero uniforms.
    frame = camera_frame(cam, w, w)
    pix = np.arange(w * w, dtype=np.int32)
    uni = np.zeros((w * w, 4), np.float32)
    o, d = camera_rays(frame, jnp.asarray(pix % w), jnp.asarray(pix // w), jnp.asarray(uni))
    ref = intersect_scene(scene, o, d)
    hit = np.asarray(ref.hit)
    expect = np.where(
        hit[:, None],
        np.array([1.0, 0.5, 0.25], np.float32),
        np.array([0.1, 0.2, 0.3], np.float32),
    )
    np.testing.assert_allclose(fb, expect, rtol=1e-4, atol=1e-5)


def test_i32_hash_matches_u32_bitexact():
    """The kernel's signed-int32 hash re-expression (Mosaic has no uint32
    vectors) must equal materials/perlin_hash.py bit-for-bit for every
    table index, and the in-kernel marble must equal the XLA texture path."""
    from raytracer_tpu.materials import perlin_hash as ph
    from raytracer_tpu.materials.textures import perlin_turbulence
    from raytracer_tpu.ops.persistent_kernel import (
        _grad_i32,
        _marble_i32,
        _perm_i32,
    )

    h_u32 = np.arange(256, dtype=np.uint32)
    h_i32 = jnp.arange(256, dtype=jnp.int32)
    for axis in range(3):
        np.testing.assert_array_equal(
            np.asarray(_perm_i32(axis, h_i32)), ph.perm_u8(axis, h_u32)
        )
    for k in range(3):
        np.testing.assert_array_equal(
            np.asarray(_grad_i32(k, h_i32)), ph.grad_component(k, h_u32)
        )

    # Marble value vs the XLA texture path on a noise scene.
    b = SceneBuilder(0)
    t = b.noise(4)
    b.lambertian(t)
    scene = b.build()
    rng = np.random.default_rng(11)
    pts = jnp.asarray(rng.uniform(-20, 20, (512, 3)).astype(np.float32))
    sp = pts * 4.0
    want = np.asarray(
        0.5 * (1.0 + jnp.sin(sp[:, 2] + 10.0 * perlin_turbulence(scene, sp, 7)))
    )
    got = np.asarray(_marble_i32(sp[:, 0], sp[:, 1], sp[:, 2]))
    np.testing.assert_allclose(got, want, rtol=0, atol=2e-6)


def test_persistent_noise_emitter_exact():
    """A huge NOISE-textured emitter around the camera: every camera ray hits
    and terminates with radiance = marble(hit point). Pins the its = -scale
    table encoding and the in-kernel procedural marble end to end."""
    from raytracer_tpu.core.camera import camera_rays
    from raytracer_tpu.geometry.intersect import intersect_scene
    from raytracer_tpu.materials.textures import perlin_turbulence

    b = SceneBuilder(0)
    tex = b.noise(0.7)
    light = b.diffuse_light(tex)
    b.add_sphere((0, 0, 0), 100.0, light)
    scene = b.build()
    assert scene.perlin_procedural and scene.has_noise
    w = 16
    cam, settings = make_camera(
        1.0, w, samples_per_pixel=1, max_depth=4, background=(9, 9, 9),
        look_from=(0, 0, 0), look_at=(0, 0, -1),
    )
    fb, segs, iters = _render_persistent(scene, cam, settings, 1, 1024)
    assert int(segs) == w * w

    # Zero uniforms -> deterministic camera rays; recompute the hit points
    # and the expected marble emission with the jnp reference path.
    frame = camera_frame(cam, w, w)
    pix = np.arange(w * w, dtype=np.int32)
    uni = np.zeros((w * w, 4), np.float32)
    o, d = camera_rays(frame, jnp.asarray(pix % w), jnp.asarray(pix // w), jnp.asarray(uni))
    ref = intersect_scene(scene, o, d)
    pt = np.asarray(o + ref.t[:, None] * d)
    sp = jnp.asarray(pt) * 0.7
    val = np.asarray(0.5 * (1.0 + jnp.sin(sp[:, 2] + 10.0 * perlin_turbulence(scene, sp, 7))))
    np.testing.assert_allclose(fb, np.tile(val[:, None], (1, 3)), rtol=2e-4, atol=2e-5)


def test_persistent_image_emitter_exact():
    """A huge IMAGE-textured emitter around the camera: every camera ray hits
    and terminates with radiance = texture(UV of hit point). Pins the whole
    in-kernel image path — packed-RGB table, invtrig spherical UV, chunked
    lane-gather, mantissa unpack — against the XLA texture path bit-close.
    The 16x48 image spans 6 x 128-texel chunks, exercising the chunk loop."""
    from raytracer_tpu.core.camera import camera_rays
    from raytracer_tpu.geometry.intersect import intersect_scene
    from raytracer_tpu.materials.textures import eval_texture
    from raytracer_tpu.ops.persistent_kernel import scene_supports_persistent

    rng = np.random.default_rng(5)
    img = rng.uniform(0.0, 1.0, (16, 48, 3)).astype(np.float32)
    b = SceneBuilder(0)
    tex = b.image(img)
    light = b.diffuse_light(tex)
    b.add_sphere((0, 0, 0), 100.0, light)
    scene = b.build()
    assert scene.has_image and scene_supports_persistent(scene)
    w = 16
    cam, settings = make_camera(
        1.0, w, samples_per_pixel=1, max_depth=4, background=(9, 9, 9),
        look_from=(0, 0, 0), look_at=(0.3, -0.2, -1),
    )
    fb, segs, iters = _render_persistent(scene, cam, settings, 1, 1024)
    assert int(segs) == w * w

    # Zero uniforms -> deterministic camera rays; recompute hit UVs and the
    # expected texture emission with the jnp reference path.
    frame = camera_frame(cam, w, w)
    pix = np.arange(w * w, dtype=np.int32)
    uni = np.zeros((w * w, 4), np.float32)
    o, d = camera_rays(frame, jnp.asarray(pix % w), jnp.asarray(pix // w), jnp.asarray(uni))
    ref = intersect_scene(scene, o, d)
    want = np.asarray(
        eval_texture(scene, jnp.full((w * w,), tex, jnp.int32), ref.u, ref.v, ref.point)
    )
    np.testing.assert_allclose(fb, want, rtol=2e-5, atol=2e-5)


def test_persistent_image_gating():
    """scene_supports_persistent: image scenes qualify on spheres AND quads
    with any number of images and either filter mode (round 3); only the
    total padded texel budget gates the path."""
    from raytracer_tpu.ops.persistent_kernel import (
        MAX_IMAGE_TEXELS,
        scene_supports_persistent,
    )

    img = np.zeros((4, 4, 3), np.float32)

    b = SceneBuilder(0)
    b.add_sphere((0, 0, -3), 1.0, b.lambertian(b.image(img)))
    assert scene_supports_persistent(b.build())

    # Image texture on a quad: supported in-kernel since round 3.
    b = SceneBuilder(0)
    b.add_quad((0, 0, -3), (1, 0, 0), (0, 1, 0), b.lambertian(b.image(img)))
    assert scene_supports_persistent(b.build())

    # Two images: supported (back-to-back packing + base offsets).
    b = SceneBuilder(0)
    b.add_sphere((0, 0, -3), 1.0, b.lambertian(b.image(img)))
    b.add_sphere((2, 0, -3), 1.0, b.lambertian(b.image(img + 0.5)))
    assert scene_supports_persistent(b.build())

    # Over the total texel budget -> fallback.
    big = np.zeros((2, MAX_IMAGE_TEXELS // 2 + 64, 3), np.float32)
    b = SceneBuilder(0)
    b.add_sphere((0, 0, -3), 1.0, b.lambertian(b.image(big)))
    assert not scene_supports_persistent(b.build())

    # Two images whose PADDED footprint exceeds the budget -> fallback
    # (images pad to a common (H, W) on the Scene).
    big2 = np.zeros((4, MAX_IMAGE_TEXELS // 8 + 64, 3), np.float32)
    b = SceneBuilder(0)
    b.add_sphere((0, 0, -3), 1.0, b.lambertian(b.image(big2)))
    b.add_sphere((2, 0, -3), 1.0, b.lambertian(b.image(big2 + 0.1)))
    assert not scene_supports_persistent(b.build())

    # Bilinear filtering: in-kernel since round 3 -> supported.
    b = SceneBuilder(0)
    b.add_sphere((0, 0, -3), 1.0, b.lambertian(b.image(img)))
    assert scene_supports_persistent(b.build(bilinear_textures=True))

    # A padded dimension >= 4096 exceeds the RES_IMGWH w*4096+h f32
    # packing (review r3): silently-wrong dims -> must fall back, even
    # though the TOTAL texel count passes the budget gate.
    wide = np.zeros((4, 4160, 3), np.float32)  # 16640 texels, w >= 4096
    b = SceneBuilder(0)
    b.add_sphere((0, 0, -3), 1.0, b.lambertian(b.image(wide)))
    assert not scene_supports_persistent(b.build())


def test_image_pack_roundtrip_exact():
    """pack_image_table packs 8-bit-quantized texels exactly: unpacking the
    f32 mantissa recovers k/255 bit-identically to the scene's stored image."""
    from raytracer_tpu.ops.persistent_kernel import pack_image_table

    rng = np.random.default_rng(9)
    img = rng.uniform(0.0, 1.0, (8, 24, 3)).astype(np.float32)
    b = SceneBuilder(0)
    b.lambertian(b.image(img))
    scene = b.build()
    table = np.asarray(pack_image_table(scene))
    flat = table.reshape(-1)[: 8 * 24]
    r = np.floor(flat / 65536.0)
    rem = flat - r * 65536.0
    g = np.floor(rem / 256.0)
    bl = rem - g * 256.0
    got = np.stack([r, g, bl], -1).astype(np.float32) * np.float32(1.0 / 255.0)
    want = np.asarray(scene.images[0]).reshape(-1, 3)
    np.testing.assert_array_equal(got, want)


def test_persistent_multi_slot_schedule():
    """spp large enough that lanes own several strided samples (num_slots > 1)
    and the wavefront is smaller than the sample budget."""
    b = SceneBuilder(0)
    b.lambertian((0.5, 0.5, 0.5))
    scene = b.build()
    cam, settings = make_camera(
        1.0, 32, samples_per_pixel=7, max_depth=4, background=(1.0, 0.5, 0.25),
        look_from=(0, 0, 2), look_at=(0, 0, 0),
    )
    spp = 7
    fb, segs, iters = _render_persistent(scene, cam, settings, spp, 1024 + 1024)
    n_pix = 32 * 32
    assert int(segs) == n_pix * spp
    expect = np.tile(np.array([1.0, 0.5, 0.25], np.float32) * spp, (n_pix, 1))
    np.testing.assert_allclose(fb, expect, rtol=1e-5, atol=1e-4)


def test_persistent_cluster_culling_matches_dense():
    """Cluster-culled sphere loop == dense sphere loop, bit-identical.

    A mixed grid scene (spheres + a ground quad + an emitter) rendered twice
    through the persistent kernel: once dense, once with the scene permuted
    into cluster order + the cluster table (geometry.bvh.cluster_scene).
    Culling only SKIPS clusters no live lane can hit, and per-lane paths/RNG
    are unaffected by sphere table order (no t-ties in a grid), so the
    framebuffers must match exactly."""
    from raytracer_tpu.geometry.bvh import cluster_scene

    rng = np.random.default_rng(11)
    b = SceneBuilder(0)
    lamb = b.lambertian((0.6, 0.5, 0.4))
    metal = b.metal((0.8, 0.8, 0.8), 0.1)
    light = b.diffuse_light((4.0, 4.0, 4.0))
    mats = [lamb, metal, light]
    for gx in range(6):
        for gz in range(6):
            c = (gx * 2.0 - 5.0, 0.4 + 0.2 * ((gx + gz) % 3), gz * 2.0 - 5.0)
            b.add_sphere(c, 0.35, mats[(gx * 7 + gz) % 3])
    b.add_quad((-20, 0, -20), (40, 0, 0), (0, 0, 40), lamb)
    scene = b.build()
    cam, settings = make_camera(
        1.0, 24, samples_per_pixel=2, max_depth=6, background=(0.5, 0.6, 0.7),
        look_from=(0, 6, 14), look_at=(0, 0, 0),
    )
    fb_dense, segs_d, _ = _render_persistent(scene, cam, settings, 2, 1024)
    scene_cl, cl_table = cluster_scene(scene, max_leaf=8)
    assert cl_table.sph.shape[0] > 1  # actually exercises multiple clusters
    assert cl_table.quad.shape[0] >= 1  # quads culled too (round 4)
    fb_cl, segs_c, _ = _render_persistent(
        scene_cl, cam, settings, 2, 1024, cluster_table=cl_table
    )
    assert int(segs_d) == int(segs_c)
    np.testing.assert_array_equal(fb_dense, fb_cl)


def test_persistent_two_level_hierarchy_matches_dense():
    """Two-level cluster culling (super-clusters over fine clusters) ==
    dense loops, bit-identical — and the front-to-back row reordering of
    cluster_for_render keeps results identical too (row order is free).

    The grid is big enough (and max_leaf small enough) that
    min_fine_for_super trips and a real super level exists for BOTH kinds:
    a sphere grid AND a quad field."""
    from raytracer_tpu.core.camera import Camera
    from raytracer_tpu.geometry.bvh import cluster_scene
    from raytracer_tpu.render.driver import _order_front_to_back

    b = SceneBuilder(0)
    lamb = b.lambertian((0.6, 0.5, 0.4))
    metal = b.metal((0.8, 0.8, 0.8), 0.05)
    mats = [lamb, metal]
    for gx in range(10):
        for gz in range(10):
            c = (gx * 1.5 - 7.0, 0.4, gz * 1.5 - 7.0)
            b.add_sphere(c, 0.3, mats[(gx + gz) % 2])
    for gx in range(8):
        for gz in range(8):
            x0, z0 = gx * 1.8 - 7.2, gz * 1.8 - 7.2
            b.add_quad((x0, 1.6, z0), (0.9, 0, 0), (0, 0, 0.9), lamb)
    scene = b.build()
    cam, settings = make_camera(
        1.0, 24, samples_per_pixel=1, max_depth=4, background=(0.5, 0.6, 0.7),
        look_from=(0, 9, 16), look_at=(0, 0, 0),
    )
    fb_dense, segs_d, _ = _render_persistent(scene, cam, settings, 1, 1024)
    scene_cl, cs = cluster_scene(scene, max_leaf=4, super_fan=4,
                                 min_fine_for_super=8)
    assert cs.sph_super.shape[0] > 1, "no sphere super level built"
    assert cs.quad_super.shape[0] > 1, "no quad super level built"
    # Supers must tile the fine rows exactly (contiguous, disjoint, total).
    for fine, sup in ((cs.sph, cs.sph_super), (cs.quad, cs.quad_super)):
        sup = np.asarray(sup)
        assert sup[0, 6] == 0.0
        np.testing.assert_array_equal(
            sup[1:, 6], np.cumsum(sup[:-1, 7])
        )
        assert int(sup[:, 7].sum()) == fine.shape[0]
    fb_cl, segs_c, _ = _render_persistent(
        scene_cl, cam, settings, 1, 1024, cluster_table=cs
    )
    assert int(segs_d) == int(segs_c)
    np.testing.assert_array_equal(fb_dense, fb_cl)

    # Front-to-back reordering (driver): same invariants, same image.
    eye = np.asarray([0.0, 9.0, 16.0])
    s_fine, s_sup = _order_front_to_back(
        np.asarray(cs.sph), np.asarray(cs.sph_super), eye
    )
    q_fine, q_sup = _order_front_to_back(
        np.asarray(cs.quad), np.asarray(cs.quad_super), eye
    )
    # Row multiset preserved; supers still tile the fine rows.
    np.testing.assert_allclose(
        np.sort(s_fine, axis=0), np.sort(np.asarray(cs.sph), axis=0)
    )
    assert int(s_sup[:, 7].sum()) == s_fine.shape[0]
    cs2 = type(cs)(
        sph=jnp.asarray(s_fine), sph_super=jnp.asarray(s_sup),
        quad=jnp.asarray(q_fine), quad_super=jnp.asarray(q_sup),
    )
    fb_o, segs_o, _ = _render_persistent(
        scene_cl, cam, settings, 1, 1024, cluster_table=cs2
    )
    assert int(segs_o) == int(segs_d)
    np.testing.assert_array_equal(fb_dense, fb_o)


def test_persistent_quad_cluster_with_image_uv_carry():
    """Quad cluster culling must thread the (alpha, beta) UV carry through
    the lax.cond skip machinery: an image-textured emissive quad field
    renders bit-identically clustered vs dense."""
    from raytracer_tpu.geometry.bvh import cluster_scene

    rng = np.random.default_rng(5)
    img = rng.uniform(0.0, 1.0, (8, 8, 3)).astype(np.float32)
    b = SceneBuilder(0)
    light = b.diffuse_light(b.image(img))
    for gx in range(5):
        for gy in range(5):
            x0, y0 = gx * 1.6 - 4.0, gy * 1.6 - 4.0
            b.add_quad((x0, y0, -6.0), (1.2, 0, 0), (0, 1.2, 0), light)
    scene = b.build()
    assert scene.has_image
    cam, settings = make_camera(
        1.0, 16, samples_per_pixel=1, max_depth=3, background=(0.1, 0.2, 0.3),
        look_from=(0, 0, 4), look_at=(0, 0, -1), fov_degrees=80,
    )
    fb_dense, segs_d, _ = _render_persistent(scene, cam, settings, 1, 1024)
    scene_cl, cs = cluster_scene(scene, max_leaf=4)
    assert cs.quad.shape[0] > 1
    fb_cl, segs_c, _ = _render_persistent(
        scene_cl, cam, settings, 1, 1024, cluster_table=cs
    )
    assert int(segs_d) == int(segs_c)
    np.testing.assert_array_equal(fb_dense, fb_cl)

    # And with a SUPER level over the quad clusters (two-level cond nesting
    # + the UV carry threading through BOTH skip levels).
    scene_cl2, cs2 = cluster_scene(
        scene, max_leaf=4, super_fan=2, min_fine_for_super=2
    )
    assert cs2.quad_super.shape[0] > 1, "no quad super level built"
    fb_cl2, segs_c2, _ = _render_persistent(
        scene_cl2, cam, settings, 1, 1024, cluster_table=cs2
    )
    assert int(segs_d) == int(segs_c2)
    np.testing.assert_array_equal(fb_dense, fb_cl2)


def test_persistent_image_on_quad_and_multi_image_exact():
    """IMAGE textures on a QUAD plus a SECOND image on a sphere, both
    emitters: every camera ray terminates at the first hit with radiance =
    texture(UV), pinned bit-close against the XLA texture path. Exercises
    the round-3 in-kernel additions: quad UV via the intersect carry, and
    multi-image base offsets + per-image true dims in the resolve table
    (images deliberately different sizes so padding strides matter)."""
    from raytracer_tpu.core.camera import camera_rays
    from raytracer_tpu.geometry.intersect import intersect_scene
    from raytracer_tpu.materials.textures import eval_texture
    from raytracer_tpu.ops.persistent_kernel import scene_supports_persistent

    rng = np.random.default_rng(9)
    img_a = rng.uniform(0.0, 1.0, (12, 20, 3)).astype(np.float32)
    img_b = rng.uniform(0.0, 1.0, (24, 10, 3)).astype(np.float32)
    b = SceneBuilder(0)
    tex_a = b.image(img_a)
    tex_b = b.image(img_b)
    light_a = b.diffuse_light(tex_a)
    light_b = b.diffuse_light(tex_b)
    # Quad fills the left of the frame, sphere the right; camera at origin.
    b.add_quad((-4.0, -2.0, -3.0), (3.5, 0, 0), (0, 4, 0), light_a)
    b.add_sphere((2.0, 0.0, -3.0), 1.4, light_b)
    scene = b.build()
    assert scene.has_image and scene_supports_persistent(scene)
    assert scene.images.shape[0] == 2

    w = 16
    cam, settings = make_camera(
        1.0, w, samples_per_pixel=1, max_depth=4, background=(9, 9, 9),
        look_from=(0, 0, 0), look_at=(0, 0, -1), fov_degrees=90,
    )
    fb, segs, iters = _render_persistent(scene, cam, settings, 1, 1024)

    frame = camera_frame(cam, w, w)
    pix = np.arange(w * w, dtype=np.int32)
    uni = np.zeros((w * w, 4), np.float32)
    o, d = camera_rays(
        frame, jnp.asarray(pix % w), jnp.asarray(pix // w), jnp.asarray(uni)
    )
    ref = intersect_scene(scene, o, d)
    tex_ids = np.where(np.asarray(ref.prim_id) == 1, tex_a, tex_b)  # sphere=0
    want = np.asarray(
        eval_texture(scene, jnp.asarray(tex_ids, jnp.int32), ref.u, ref.v, ref.point)
    )
    want = np.where(np.asarray(ref.hit)[:, None], want, [9.0, 9.0, 9.0])
    hits_quad = (np.asarray(ref.hit) & (np.asarray(ref.prim_id) >= 1)).sum()
    hits_sph = (np.asarray(ref.hit) & (np.asarray(ref.prim_id) == 0)).sum()
    assert hits_quad > 10 and hits_sph > 10  # both primitives exercised
    np.testing.assert_allclose(fb, want, rtol=2e-5, atol=2e-5)


def test_persistent_wavefront_smaller_than_image():
    """wavefront < n_pixels — the regime where XLA:TPU miscompiled the
    retirement-log fold fusion (round 3; see the optimization_barrier note in
    wavefront._fold_log): with a white background and no geometry the
    framebuffer is an exact per-pixel sample counter, so any slot/pixel
    misrouting or double-count shows as a pixel != spp."""
    b = SceneBuilder(0)
    b.lambertian((0.5, 0.5, 0.5))
    scene = b.build()
    cam, settings = make_camera(
        1.0, 48, samples_per_pixel=5, max_depth=4, background=(1.0, 1.0, 1.0),
        look_from=(0, 0, 2), look_at=(0, 0, 0),
    )
    spp = 5
    fb, segs, iters = _render_persistent(scene, cam, settings, spp, 2048)
    n_pix = 48 * 48
    assert 2048 < n_pix  # the config actually exercises wavefront < pixels
    assert int(segs) == n_pix * spp
    np.testing.assert_allclose(
        fb, np.full((n_pix, 3), float(spp), np.float32), rtol=0, atol=1e-5
    )


def test_persistent_image_bilinear_exact():
    """Bilinear in-kernel image fetch (round 3, closing the round-2 advisor
    gate): a huge bilinear image-textured emitter pins the 4-tap in-kernel
    path — shared chunk-band scan, per-tap mantissa unpack, lerp order —
    against the XLA bilinear texture path bit-close, on a sphere AND on a
    quad (quad UV rides the intersect carry)."""
    from raytracer_tpu.core.camera import camera_rays
    from raytracer_tpu.geometry.intersect import intersect_scene
    from raytracer_tpu.materials.textures import eval_texture
    from raytracer_tpu.ops.persistent_kernel import scene_supports_persistent

    rng = np.random.default_rng(9)
    img = rng.uniform(0.0, 1.0, (16, 48, 3)).astype(np.float32)
    img2 = rng.uniform(0.0, 1.0, (11, 13, 3)).astype(np.float32)
    b = SceneBuilder(0)
    tex = b.image(img)
    b.add_sphere((0, 0, 0), 100.0, b.diffuse_light(tex))
    tex2 = b.image(img2)
    # A quad in front of the camera: some pixels resolve the quad UV path.
    b.add_quad((-0.8, -0.8, -2.0), (1.6, 0, 0), (0, 1.6, 0), b.diffuse_light(tex2))
    scene = b.build(bilinear_textures=True)
    assert scene.bilinear_textures and scene_supports_persistent(scene)
    w = 16
    cam, settings = make_camera(
        1.0, w, samples_per_pixel=1, max_depth=4, background=(9, 9, 9),
        look_from=(0, 0, 0), look_at=(0.1, -0.1, -1),
    )
    fb, segs, iters = _render_persistent(scene, cam, settings, 1, 1024)
    assert int(segs) == w * w

    frame = camera_frame(cam, w, w)
    pix = np.arange(w * w, dtype=np.int32)
    uni = np.zeros((w * w, 4), np.float32)
    o, d = camera_rays(frame, jnp.asarray(pix % w), jnp.asarray(pix // w), jnp.asarray(uni))
    ref = intersect_scene(scene, o, d)
    tex_ids = np.where(np.asarray(ref.prim_id) >= scene.num_spheres, tex2, tex)
    want = np.asarray(
        eval_texture(scene, jnp.asarray(tex_ids, jnp.int32), ref.u, ref.v, ref.point)
    )
    quad_frac = float((np.asarray(ref.prim_id) >= scene.num_spheres).mean())
    assert 0.1 < quad_frac < 0.9  # both UV paths exercised
    np.testing.assert_allclose(fb, want, rtol=2e-5, atol=2e-5)


def test_persistent_stochastic_bilinear_tap_selection_exact():
    """Production bilinear filtering is STOCHASTIC (one tap sampled with
    its bilinear weight — unbiased; ops/persistent_kernel.py round-4 note).
    The interpreter stubs the HW PRNG to zeros, making the tap choice
    deterministic: u=0 < frac picks the +1 tap wherever frac > 0, i.e. the
    fetched texel is exactly (floor(x)+ (fx>0), floor(y)+(fy>0)) clamped.
    Pinning that image bit-close proves the index math and the single-tap
    fetch machinery; the unbiasedness E[tap]=bilinear is checked
    statistically on real hardware (scripts/check_persistent_tpu.py)."""
    from raytracer_tpu.core.camera import camera_rays
    from raytracer_tpu.geometry.intersect import intersect_scene

    rng = np.random.default_rng(21)
    img = rng.uniform(0.0, 1.0, (16, 48, 3)).astype(np.float32)
    b = SceneBuilder(0)
    b.add_sphere((0, 0, 0), 100.0, b.diffuse_light(b.image(img)))
    scene = b.build(bilinear_textures=True)
    w = 16
    cam, settings = make_camera(
        1.0, w, samples_per_pixel=1, max_depth=4, background=(9, 9, 9),
        look_from=(0, 0, 0), look_at=(0.1, -0.1, -1),
    )
    fb, segs, _ = _render_persistent(
        scene, cam, settings, 1, 1024, bilinear_stochastic=True
    )
    assert int(segs) == w * w

    frame = camera_frame(cam, w, w)
    pix = np.arange(w * w, dtype=np.int32)
    uni = np.zeros((w * w, 4), np.float32)
    o, d = camera_rays(
        frame, jnp.asarray(pix % w), jnp.asarray(pix // w), jnp.asarray(uni)
    )
    ref = intersect_scene(scene, o, d)
    h_t, w_t = img.shape[0], img.shape[1]
    # Same conventions as textures._image_lookup_bilinear: u clamped,
    # v flipped (materials.go:181-182).
    x = np.clip(np.asarray(ref.u), 0.0, 1.0) * w_t - 0.5
    y = (1.0 - np.clip(np.asarray(ref.v), 0.0, 1.0)) * h_t - 0.5
    fx = x - np.floor(x)
    fy = y - np.floor(y)
    iu = np.clip(np.floor(x).astype(int) + (fx > 0), 0, w_t - 1)
    iv = np.clip(np.floor(y).astype(int) + (fy > 0), 0, h_t - 1)
    # Index the SCENE's texels (8-bit-quantized at build time), not the
    # raw float input image.
    want = np.asarray(scene.images)[0, iv, iu]
    np.testing.assert_allclose(fb, want, rtol=2e-5, atol=2e-5)


def test_persistent_image_bilinear_wide_exact():
    """Wide images (padded width >= 256, so the v0/v1 texture rows sit >= 2
    chunks apart) still go through the ONE shared chunk-band scan for all 4
    taps (a two-band split was measured slower and not kept —
    ops/persistent_kernel.py round-4 note); pin the wide-image case
    bit-close against the XLA bilinear path on a sphere AND a quad, exactly
    like the narrow-image test pins the adjacent-row case."""
    from raytracer_tpu.core.camera import camera_rays
    from raytracer_tpu.geometry.intersect import intersect_scene
    from raytracer_tpu.materials.textures import eval_texture
    from raytracer_tpu.ops.persistent_kernel import scene_supports_persistent

    rng = np.random.default_rng(13)
    img = rng.uniform(0.0, 1.0, (12, 320, 3)).astype(np.float32)
    img2 = rng.uniform(0.0, 1.0, (9, 260, 3)).astype(np.float32)
    b = SceneBuilder(0)
    tex = b.image(img)
    tex2 = b.image(img2)
    b.add_sphere((0, 0, 0), 100.0, b.diffuse_light(tex))
    b.add_quad(
        (-0.8, -0.8, -2.0), (1.6, 0, 0), (0, 1.6, 0), b.diffuse_light(tex2)
    )
    scene = b.build(bilinear_textures=True)
    assert scene.bilinear_textures and scene_supports_persistent(scene)
    assert scene.images.shape[2] >= 256  # two-band path active
    w = 16
    cam, settings = make_camera(
        1.0, w, samples_per_pixel=1, max_depth=4, background=(9, 9, 9),
        look_from=(0, 0, 0), look_at=(0.1, -0.1, -1),
    )
    fb, segs, iters = _render_persistent(scene, cam, settings, 1, 1024)
    assert int(segs) == w * w

    frame = camera_frame(cam, w, w)
    pix = np.arange(w * w, dtype=np.int32)
    uni = np.zeros((w * w, 4), np.float32)
    o, d = camera_rays(
        frame, jnp.asarray(pix % w), jnp.asarray(pix // w), jnp.asarray(uni)
    )
    ref = intersect_scene(scene, o, d)
    tex_ids = np.where(np.asarray(ref.prim_id) >= scene.num_spheres, tex2, tex)
    want = np.asarray(
        eval_texture(
            scene, jnp.asarray(tex_ids, jnp.int32), ref.u, ref.v, ref.point
        )
    )
    quad_frac = float((np.asarray(ref.prim_id) >= scene.num_spheres).mean())
    assert 0.1 < quad_frac < 0.9
    # Slightly looser than the narrow test: at 320-texel widths the UV ->
    # texel-coordinate map amplifies invtrig/lerp rounding; observed max
    # diff 4.5e-5 on 5/768 channels — far below one texel step (~0.1), so
    # the taps are right and only blend weights differ in the last ulps.
    np.testing.assert_allclose(fb, want, rtol=1e-4, atol=1e-4)


def test_supports_persistent_hires_texture_gate():
    """Round-5 texel budget: the REAL earthmap.jpg resolution (512x1024)
    shades in-kernel; images past 1M texels (or any dim >= 4096) still
    fall back."""
    from raytracer_tpu.ops.persistent_kernel import (
        MAX_IMAGE_TEXELS,
        scene_supports_persistent,
    )

    def scene_with(h, w):
        b = SceneBuilder(0)
        tex = b.image(np.zeros((h, w, 3), np.float32))
        b.add_sphere((0, 0, 0), 1.0, b.lambertian(tex))
        return b.build()

    assert MAX_IMAGE_TEXELS >= 512 * 1024
    assert scene_supports_persistent(scene_with(512, 1024))
    assert scene_supports_persistent(scene_with(1024, 1024))
    assert not scene_supports_persistent(scene_with(2048, 1024))
    assert not scene_supports_persistent(scene_with(2, 4096))
