"""Sharded wavefront rendering over a device mesh (shard_map + collectives).

The image's pixel axis shards over the `tiles` mesh axis and the spp budget
over the `samples` axis; each device traces its own wavefront locally (the
wavefront loop needs no cross-device communication — rays never migrate), and
the per-pixel sample sum reduces over the `samples` axis. This is the
TPU-native replacement for the reference's worker pool + ordered channel
fan-in (camera.go:167-230): ordering is free (indexed writes) and "fan-in" is
an XLA collective riding ICI.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.6 exposes shard_map at top level
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from raytracer_tpu.core.camera import Camera, RenderSettings, camera_frame, camera_rays
from raytracer_tpu.geometry.scene import Scene
from raytracer_tpu.integrator.wavefront import trace
from raytracer_tpu.parallel.mesh import SAMPLE_AXIS, TILE_AXIS


def _pad_to(x: int, m: int) -> int:
    return (x + m - 1) // m * m


@partial(
    jax.jit,
    static_argnames=("mesh", "width", "height", "samples_per_pass", "max_depth", "sky_gradient"),
)
def render_pass_sharded(
    scene: Scene,
    cam: Camera,
    key,
    *,
    mesh: Mesh,
    width: int,
    height: int,
    samples_per_pass: int,
    max_depth: int,
    sky_gradient: bool,
):
    """One sharded pass: per-pixel radiance *sum* over `samples_per_pass`
    samples, shape (height, width, 3), sharded over the tile axis.

    Pixel count pads up to the tile-axis size; samples_per_pass must divide
    by the sample-axis size (callers use `sharded_samples_per_pass`).
    """
    n_tiles = mesh.shape[TILE_AXIS]
    n_samp = mesh.shape[SAMPLE_AXIS]
    if samples_per_pass % n_samp != 0:
        raise ValueError(f"{samples_per_pass=} not divisible by {n_samp=}")

    n = width * height
    n_pad = _pad_to(n, n_tiles)
    # (k, n_pad) grid of (sample slot, pixel id); padded pixels clamp to the
    # last real pixel and are dropped after the reduce.
    pix = jnp.minimum(
        jax.lax.broadcasted_iota(jnp.int32, (samples_per_pass, n_pad), 1), n - 1
    )

    frame = camera_frame(cam, width, height)
    background = cam.background

    def local_pass(pix_block, key):
        """Runs per device: pix_block (k_loc, n_loc)."""
        ti = jax.lax.axis_index(TILE_AXIS)
        si = jax.lax.axis_index(SAMPLE_AXIS)
        dev_key = jax.random.fold_in(jax.random.fold_in(key, ti), si)
        k_loc, n_loc = pix_block.shape
        flat_pix = pix_block.reshape(-1)
        key_cam, key_trace = jax.random.split(dev_key)
        uniforms = jax.random.uniform(key_cam, (k_loc * n_loc, 4), jnp.float32)
        o, d = camera_rays(frame, flat_pix % width, flat_pix // width, uniforms)
        radiance = trace(
            scene,
            o,
            d,
            key_trace,
            background,
            max_depth=max_depth,
            sky_gradient=sky_gradient,
        )
        # Local partial sum over this device's sample slots; the global sum
        # over the sample axis happens in the out-sharded reduce below.
        return radiance.reshape(k_loc, n_loc, 3).sum(axis=0, keepdims=True)

    def wrapped(pix_grid, key):
        return shard_map(
            local_pass,
            mesh=mesh,
            in_specs=(P(SAMPLE_AXIS, TILE_AXIS), P()),
            out_specs=P(SAMPLE_AXIS, TILE_AXIS),
            check_vma=False,  # while_loop carry inits are unvarying constants
        )(pix_grid, key)

    partial_sums = wrapped(pix, key)  # (n_samp, n_pad, 3) sharded
    per_pixel = partial_sums.sum(axis=0)  # reduce over sample axis (psum)
    return per_pixel[:n].reshape(height, width, 3)


def sharded_samples_per_pass(spp: int, num_pixels: int, mesh: Mesh, target_rays: int) -> int:
    """Largest k dividing spp with k % sample_axis == 0 and k*n <= target."""
    n_samp = mesh.shape[SAMPLE_AXIS]
    ideal = max(n_samp, min(spp, target_rays // max(1, num_pixels)))
    for k in range(ideal, 0, -1):
        if spp % k == 0 and k % n_samp == 0:
            return k
    return n_samp if spp % n_samp == 0 else spp


def render_image_sharded(
    scene: Scene,
    cam: Camera,
    settings: RenderSettings,
    mesh: Mesh,
    *,
    seed: int = 0,
    target_rays_per_pass: int = 1 << 20,
) -> jnp.ndarray:
    """Full sharded render; returns linear mean radiance (H, W, 3)."""
    w, h, spp = settings.width, settings.height, settings.samples_per_pixel
    k = sharded_samples_per_pass(spp, w * h, mesh, target_rays_per_pass)
    if spp % k != 0:
        raise ValueError(f"spp={spp} not divisible by chosen k={k}")
    passes = spp // k
    key = jax.random.PRNGKey(seed)
    acc = jnp.zeros((h, w, 3), jnp.float32)
    for p in range(passes):
        acc = acc + render_pass_sharded(
            scene,
            cam,
            jax.random.fold_in(key, p),
            mesh=mesh,
            width=w,
            height=h,
            samples_per_pass=k,
            max_depth=settings.max_depth,
            sky_gradient=settings.sky_gradient,
        )
    return acc / jnp.float32(spp)
