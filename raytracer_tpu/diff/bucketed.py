"""Depth-bucketed tape-replay gradients: stop paying max_depth for every lane.

The scan backend (diff/grad.render_linear_diff) runs a fixed `max_depth`
checkpointed scan over ALL lanes — forward and rematerialized backward —
even though the average path is ~2.5 bounces on the reference scenes, so
>80% of the per-bounce shade/state work is spent on dead lanes (the
round-3 "known headroom, deliberately not taken"). Reverse-mode needs a
static trip count, so the loop cannot early-exit; what it CAN do is run
shorter static loops on the lanes that need less depth.

Pipeline (one optimization step):

1. **Fast forward + tape** (non-differentiable, `lax.while_loop` — exits
   at the true max live depth): full radiance image, the (max_depth, N)
   winner tape, the loss, the per-lane loss cotangent, and each lane's
   exact path length L derived from the tape (L = last recorded hit + 2,
   capped — one extra bounce covers the terminal miss/absorb; replaying a
   dead lane is exact, so over-estimating L is safe and under-estimating
   is impossible: a lane alive at bounce b hit at b-1).
2. **Host bucketing** (one tiny L transfer): lanes sorted into buckets of
   static depths (1, 2, 4, ..., max_depth), each padded to a quantized
   size so recompiles are bounded (sizes repeat across steps of an
   optimization — the depth distribution of a scene is stable).
3. **Per-bucket differentiable replay**: the SAME checkpointed-scan
   integrator, but with its static length = the bucket depth and its
   intersector replaying the tape (O(1)/lane — diff/tape.py). The bucket's
   parameter gradient is the VJP of (params -> bucket radiance) against
   the forward's cotangent rows; summing buckets gives the exact loss
   gradient (chain rule through the per-pixel mean; replay radiance ==
   forward radiance is the tape estimator identity, pinned by test).

Per-(bounce, lane) uniforms come from a per-lane key stream
(fold_in(key_u, lane) -> uniform((max_depth, U))), so any bucket can
regenerate exactly its lanes' randomness without materializing or
slicing a global sequence inconsistently.

Trainables: scene parameters (params -> rebuild(params) -> Scene), and —
round 5 — optionally the CAMERA: pass rebuild_camera and keep the camera
leaves under params["camera"]; the replay rebuilds the camera frame inside
the differentiable region so look_from/look_at/fov/defocus/background
gradients flow through camera_rays exactly as in the scan backend.
Visibility-boundary terms (diff/boundary.py silhouettes,
diff/shadow_edge.py first-bounce shadow edges) compose via
`edge_image_fns`: each is a zero-valued gradient image fn(params, cam,
key) -> (H, W, 3) whose VJP against the forward's image cotangent adds the
boundary contribution the interior replay cannot see (round-4 VERDICT #3:
speed and silhouettes no longer trade off).

Round 5: with forward="kernel" the fast forward + tape RECORDING run
inside the persistent Pallas kernel (ops/persistent_kernel.
render_persistent_tape) — all randomness switches to the stateless
counter RNG (ops/ctr_rng.py) so the replay regenerates any lane subset's
uniforms bit-exactly — and the forward itself is two-phase: a
depth-capped kernel launch (fwd_cap) plus an XLA finish of the ~1% of
lanes still alive at the cap (docs/PERF_NOTES.md round 5; pinned
bit-identical by tests/test_ktape.py). Measured at the reference
400x225@8spp depth-50 config: 0.70 s/step vs the scan backend's 3.88.

Environment caveat (measured round 4, docs/PERF_NOTES.md): through the
axon remote-TPU tunnel, host-orchestrated steps pay per-call dispatch and
any host<->device traffic dearly — the tape must stay device-resident
(one (max_depth, N) transfer per step measured 144 MB and dominated
everything) and padded shapes must come from a geometric ladder (a fresh
padded size mid-run costs a ~minute remote compile). Current measured
numbers are in docs/PERF_NOTES.md round 4. Gradient parity with a
same-uniforms full-depth replay is pinned to fp tolerance by
tests/test_grad.py.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from raytracer_tpu.core.camera import Camera, camera_frame, camera_rays
from raytracer_tpu.diff.tape import make_tape_intersect_fn
from raytracer_tpu.integrator.wavefront import trace
from raytracer_tpu.materials.materials import UNIFORMS_PER_BOUNCE


def _lane_uniforms(key_u, lane_ids, max_depth: int):
    """(len(lane_ids), max_depth, U) uniforms from per-lane key streams —
    reproducible for any lane subset."""
    def one(lane):
        return jax.random.uniform(
            jax.random.fold_in(key_u, lane),
            (max_depth, UNIFORMS_PER_BOUNCE),
            jnp.float32,
        )

    return jax.vmap(one)(lane_ids)


# Reserved key for camera leaves when the camera is trainable.
CAMERA_PARAM_KEY = "camera"


def split_camera(cam: Camera, trainable=("look_from", "look_at")):
    """(camera params dict, rebuild_camera) for camera optimization —
    the camera analog of diff.grad.split_scene."""
    cparams = {name: getattr(cam, name) for name in trainable}

    def rebuild_camera(cp):
        return cam._replace(**cp)

    return cparams, rebuild_camera


def _scene_and_camera(params, rebuild, rebuild_camera, cam_default):
    """Resolve (Scene, Camera) from a params dict that may carry camera
    leaves under CAMERA_PARAM_KEY."""
    if rebuild_camera is None:
        return rebuild(params), cam_default
    sp = {k: v for k, v in params.items() if k != CAMERA_PARAM_KEY}
    return rebuild(sp), rebuild_camera(params[CAMERA_PARAM_KEY])


def default_depth_ladder(max_depth: int) -> tuple[int, ...]:
    """Static bucket depths: 1 (the sky-miss lanes — no scene hit at all,
    a large fraction of any sky-lit image) then powers of two up to
    max_depth (always included). A final power within 1.6x of max_depth is
    dropped (e.g. 32 under depth 50): its lanes are rare enough that a
    separate bucket pays more in pad floor than the shorter replay saves
    (round-5 measurement: merging 32 into 50 cut ~1.0M of 4.4M padded
    lane-bounces at the reference config)."""
    ladder = [1]
    d = 2
    while d < max_depth:
        ladder.append(d)
        d *= 2
    if len(ladder) > 1 and max_depth < ladder[-1] * 1.6:
        ladder.pop()
    ladder.append(max_depth)
    return tuple(ladder)


def _pad_size_halfoct(sz: int, floor: int) -> int:
    """Smallest {2^k, 1.5*2^k} grid point >= sz (>= floor): half-octave
    spacing halves the average padding waste of the pure powers-of-two
    ladder (51% worst case -> 22%) while keeping the set of compilable
    shapes small and stable."""
    p = floor
    while p < sz:
        if p * 3 // 2 >= sz:
            return p * 3 // 2
        p *= 2
    return p


class _PadMemo:
    """Per-bucket padded-size memo with hysteresis: a bucket keeps its last
    padded size while the population still fits and the size is not more
    than ~2x oversized — population jitter (~sqrt(N)/step from the fresh
    PRNG key) must not oscillate a bucket across a grid boundary, because
    every distinct tuple of padded sizes is a fresh compile of the fused
    all-buckets program (~minute-scale through the remote-compile
    tunnel)."""

    def __init__(self, floor: int):
        self.floor = floor
        self.last: dict[int, int] = {}

    def __call__(self, depth: int, sz: int) -> int:
        # 2% + 64 headroom: per-step population jitter (fresh PRNG key)
        # must not push a bucket just past a grid point one step after it
        # compiled — each growth is a fresh ~20 s remote compile mid-run.
        want = _pad_size_halfoct(int(sz * 1.02) + 64, self.floor)
        prev = self.last.get(depth)
        if prev is not None and sz <= prev and want * 2 > prev:
            return prev
        self.last[depth] = want
        return want


def make_bucketed_grad_fn(
    rebuild,
    cam: Camera,
    target,
    *,
    width: int,
    height: int,
    samples_per_pass: int,
    max_depth: int,
    sky_gradient: bool = False,
    depths: tuple[int, ...] | None = None,
    quant: int = 1 << 14,
    forward: str = "xla",
    scene_probe=None,
    tape_rows: int = 0,
    edge_image_fns: tuple = (),
    rebuild_camera=None,
    fwd_cap: int = 16,
):
    """Build `step(params, key) -> (loss, grads)` with depth-bucketed
    backward. `rebuild(params) -> Scene` as from diff.grad.split_scene.

    edge_image_fns: zero-valued gradient-image fns (diff/boundary,
    diff/shadow_edge) composed by VJP against the forward image cotangent.
    rebuild_camera: makes the camera trainable — params must then carry its
    leaves under params["camera"] (see split_camera).

    forward="kernel" (round 5, VERDICT #1): the fast forward + winner tape
    run INSIDE the persistent Pallas kernel
    (ops/persistent_kernel.render_persistent_tape) instead of the phased XLA
    while_loop — ~an order of magnitude cheaper, since the kernel pays no
    per-bounce XLA glue and its tiles drain independently. All randomness
    (camera + per-bounce) then comes from the stateless counter RNG
    (ops/ctr_rng.py), which the differentiable replay regenerates
    bit-exactly per bucket. Requires `scene_probe` (a Scene with the same
    static shape rebuild() produces) for the static kernel configuration;
    the scene must pass scene_supports_persistent. forward="xla" keeps the
    round-4 phase-compacted threefry forward (the CPU/unsupported-scene
    path)."""
    n = width * height
    k = samples_per_pass
    total = k * n
    ladder = depths or default_depth_ladder(max_depth)
    assert ladder[-1] == max_depth, (ladder, max_depth)
    assert forward in ("xla", "kernel"), forward

    if forward == "kernel":
        inner = _make_kernel_bucketed_grad_fn(
            rebuild, cam, target, scene_probe,
            width=width, height=height, samples_per_pass=samples_per_pass,
            max_depth=max_depth, sky_gradient=sky_gradient, ladder=ladder,
            quant=quant, tape_rows=tape_rows, rebuild_camera=rebuild_camera,
            fwd_cap=fwd_cap,
        )
        return _compose_edges(
            inner, edge_image_fns, rebuild_camera, cam
        )

    use_pallas_fwd = jax.default_backend() == "tpu"

    def _intersect_fwd():
        if not use_pallas_fwd:
            return None
        from raytracer_tpu.geometry.intersect import intersect_scene_pallas_diff

        return intersect_scene_pallas_diff

    # Forward phases: the non-diff tape forward ALSO wastes dead-lane work
    # if run as one while_loop over all lanes — one deep glass path keeps
    # the whole 720K-lane batch iterating (measured: the naive forward was
    # ~3 s of the 3.6 s step at 400x225 depth 50). So the forward runs in
    # compaction phases: trace everyone to depth p0, keep only survivors
    # (host gather, padded to `quant`), continue to p1, ... — cost becomes
    # proportional to actual lane-bounces, like the buckets themselves.
    fwd_phases = tuple(p for p in (4, 16) if p < max_depth) + (max_depth,)

    # Every piece of per-phase device work lives INSIDE one jitted call:
    # through the axon tunnel each eager device op is a full dispatch
    # round-trip (and the 144 MB tape would be copied per op), which
    # measured 8-15 s/step when the scatters/gathers ran eagerly. The tape
    # and radiance buffers are donated through the phase chain.

    @jax.jit
    def phase0(params, key):
        scene, cam_p = _scene_and_camera(params, rebuild, rebuild_camera, cam)
        frame = camera_frame(cam_p, width, height)
        key_cam, key_u = jax.random.split(key)
        pix = jax.lax.broadcasted_iota(jnp.int32, (total, 1), 0)[:, 0] % n
        cam_uni = jax.random.uniform(key_cam, (total, 4), jnp.float32)
        o, d = camera_rays(frame, pix % width, pix // width, cam_uni)
        d0 = fwd_phases[0]
        useq = jnp.transpose(
            _lane_uniforms(key_u, jnp.arange(total, dtype=jnp.int32), d0),
            (1, 0, 2),
        )
        sg = jax.lax.stop_gradient
        st = trace(
            sg(scene), sg(o), sg(d), jax.random.PRNGKey(0),
            sg(cam_p.background), max_depth=d0, sky_gradient=sky_gradient,
            uniform_seq=sg(useq), intersect_fn=_intersect_fwd(),
            return_tape=True, return_state=True,
        )
        tape = jnp.full((max_depth, total), -1, jnp.int32)
        tape = tape.at[:d0].set(st.tape)
        return (
            st.radiance, tape, st.alive,
            st.origin, st.direction, st.throughput,
        )

    @partial(
        jax.jit,
        static_argnames=("d_lo", "d_hi"),
        donate_argnums=(7, 8),  # radiance, tape flow through the chain
    )
    def phase_next(
        params, key, sel, src, prev_o, prev_d, prev_t, radiance, tape,
        amask, *, d_lo, d_hi,
    ):
        """Continue the lanes `sel` (original ids, padded) from bounce d_lo
        to d_hi. `src` indexes the PREVIOUS phase's state arrays (identity
        gather positions); all scatters back into radiance/tape happen here,
        in-graph."""
        scene, cam_p = _scene_and_camera(params, rebuild, rebuild_camera, cam)
        _, key_u = jax.random.split(key)
        useq = jnp.transpose(
            _lane_uniforms(key_u, sel, d_hi)[:, d_lo:d_hi, :], (1, 0, 2)
        )
        sg = jax.lax.stop_gradient
        st = trace(
            sg(scene), sg(prev_o[src]), sg(prev_d[src]),
            jax.random.PRNGKey(0), sg(cam_p.background),
            max_depth=d_hi - d_lo, sky_gradient=sky_gradient,
            uniform_seq=sg(useq), intersect_fn=_intersect_fwd(),
            return_tape=True, return_state=True,
            init_throughput=prev_t[src],
            init_radiance=jnp.zeros_like(prev_t[src]),
            init_alive=amask,
        )
        radiance = radiance.at[sel].add(
            jnp.where(amask[:, None], st.radiance, 0.0)
        )
        # Padded columns all collide on lane 0; scatter-MAX cannot clobber
        # it because tape values are >= -1 and pads write exactly -1.
        tape = tape.at[d_lo:d_hi, sel].max(
            jnp.where(amask[None, :], st.tape, -1)
        )
        return (
            radiance, tape, st.alive,
            st.origin, st.direction, st.throughput,
        )

    @jax.jit
    def loss_ct_depth(radiance, tape):
        img = radiance.reshape(k, n, 3).mean(0).reshape(height, width, 3)
        loss = jnp.mean((img - target) ** 2)
        # d loss / d radiance_lane: chain through the (k, n) mean and the
        # MSE; each lane contributes 1/k of its pixel.
        ct_img = 2.0 * (img - target) / jnp.float32(img.size)
        pix = jax.lax.broadcasted_iota(jnp.int32, (total, 1), 0)[:, 0] % n
        ct_lane = ct_img.reshape(n, 3)[pix] / jnp.float32(k)
        # Exact path length from the tape (see module docstring).
        hitb = tape >= 0
        last_hit = jnp.max(
            jnp.where(
                hitb, jnp.arange(max_depth, dtype=jnp.int32)[:, None], -1
            ),
            axis=0,
        )
        lane_depth = jnp.minimum(last_hit + 2, max_depth)
        return loss, ct_lane, lane_depth, ct_img

    # Half-octave padded sizes with per-bucket hysteresis (see _PadMemo) —
    # round 5: the pure quant-powers ladder wasted ~45% of the replayed
    # lane-bounces as padding at the reference config. Floor 2048: deep
    # buckets hold only a few thousand lanes, and a 16K floor made the
    # depth-50 bucket alone ~20% of all replayed lane-bounces.
    pad_memo = _PadMemo(min(quant, 2048))

    def _padded_idx(memo_key, ids: np.ndarray):
        padded = pad_memo(memo_key, ids.size)
        pad = padded - ids.size
        sel = jnp.asarray(
            np.concatenate([ids, np.zeros(pad, np.int64)]), jnp.int32
        )
        amask = jnp.asarray(
            np.concatenate([np.ones(ids.size, bool), np.zeros(pad, bool)])
        )
        return sel, amask

    def forward(params, key):
        radiance, tape, alive_d, o_d, d_d, t_d = phase0(params, key)
        orig = np.flatnonzero(np.asarray(alive_d))  # the one transfer/phase
        pos = orig  # positions within the current phase's state arrays
        d_lo = fwd_phases[0]
        for d_hi in fwd_phases[1:]:
            if orig.size == 0:
                break
            sel, amask = _padded_idx(("phase", d_lo), orig)
            src, _ = _padded_idx(("phase", d_lo), pos)
            radiance, tape, alive_d, o_d, d_d, t_d = phase_next(
                params, key, sel, src, o_d, d_d, t_d, radiance, tape,
                amask, d_lo=d_lo, d_hi=d_hi,
            )
            alive2 = np.asarray(alive_d)[: orig.size]
            pos = np.flatnonzero(alive2)
            orig = orig[alive2]
            d_lo = d_hi
        loss, ct_lane, lane_depth, ct_img = loss_ct_depth(radiance, tape)
        return loss, tape, ct_lane, np.asarray(lane_depth), ct_img

    @jax.jit
    def all_buckets_grad(params, key, ct_lane, tape, bucket_args):
        """Gradient of the loss: the sum over buckets of the VJP of
        params -> sum(replay_radiance[idx] * ct), ct masked to zero on
        padded lanes. `bucket_args` is a tuple aligned with `ladder` of
        (idx, mask) pairs or None for empty buckets — its pytree structure
        (and the padded sizes) are the only compile keys, so ONE launch
        covers every bucket. (Measured NEUTRAL vs a launch per bucket —
        the small-config floor is the phased forward, not dispatch — but
        one program means one compile key and simpler accumulation.)"""
        key_cam, key_u = jax.random.split(key)
        cam_uni_all = jax.random.uniform(key_cam, (total, 4), jnp.float32)

        grads = jax.tree_util.tree_map(jnp.zeros_like, params)
        for depth, ba in zip(ladder, bucket_args):
            if ba is None:
                continue
            if depth == 1 and _skip_depth1(sky_gradient, rebuild_camera):
                # Pure sky-miss lanes: radiance == flat background with
                # unit throughput, touching no scene parameter — provably
                # zero gradient (see _skip_depth1).
                continue
            idx, mask = ba
            pix = idx % n  # lane id -> pixel id (lane = s * n + pixel)
            tape_b = tape[:depth][:, idx]  # (depth, B)
            # Per-lane uniform streams are PREFIX-STABLE across draw shapes
            # (uniform(key, (d, U)) == uniform(key, (D, U))[:d] — pinned by
            # tests/test_grad.py::test_uniform_prefix_stability), so the
            # bucket generates only its own depth's worth.
            useq_b = jnp.transpose(
                _lane_uniforms(key_u, idx, depth), (1, 0, 2)
            )
            ct_rows = ct_lane[idx] * mask[:, None]

            def scalar_loss(p, pix=pix, idx=idx, useq_b=useq_b,
                            tape_b=tape_b, ct_rows=ct_rows, depth=depth):
                scene, cam_p = _scene_and_camera(
                    p, rebuild, rebuild_camera, cam
                )
                frame = camera_frame(cam_p, width, height)
                o, d = camera_rays(
                    frame, pix % width, pix // width, cam_uni_all[idx]
                )
                radiance = trace(
                    scene,
                    o,
                    d,
                    jax.random.PRNGKey(0),
                    cam_p.background,
                    max_depth=depth,
                    sky_gradient=sky_gradient,
                    differentiable=True,
                    uniform_seq=useq_b,
                    intersect_fn=make_tape_intersect_fn(tape_b),
                    intersect_fn_differentiable=True,
                    # Keep the per-bounce remat even for shallow buckets:
                    # storing residuals instead was measured 2-3x SLOWER on
                    # v5e (HBM-bandwidth bound; the recompute is VPU-cheap).
                )
                return jnp.sum(radiance * ct_rows)

            grads = jax.tree_util.tree_map(
                jnp.add, grads, jax.grad(scalar_loss)(params)
            )
        return grads

    def step(params, key):
        loss, tape, ct_lane, lane_depth, ct_img = forward(params, key)
        remaining = np.arange(total, dtype=np.int64)
        rem_depth = lane_depth
        bucket_args = []
        for depth in ladder:
            in_bucket = rem_depth <= depth
            idx = remaining[in_bucket]
            remaining = remaining[~in_bucket]
            rem_depth = rem_depth[~in_bucket]
            if idx.size == 0:
                bucket_args.append(None)
                continue
            # Pad to a quantized static size: padded lanes replay lane 0
            # with a ZERO cotangent, so they cannot contribute gradient.
            idx_j, amask = _padded_idx(depth, idx)
            bucket_args.append((idx_j, amask.astype(jnp.float32)))
        assert remaining.size == 0, "depth ladder must end at max_depth"
        grads = all_buckets_grad(
            params, key, ct_lane, tape, tuple(bucket_args)
        )
        return loss, grads, ct_img

    return _compose_edges(step, edge_image_fns, rebuild_camera, cam)


def _skip_depth1(sky_gradient: bool, rebuild_camera) -> bool:
    """The depth-1 bucket holds lanes whose FIRST intersection already
    missed (tape row 0 == -1): their radiance is 1 * flat_background,
    touching no scene parameter, so the bucket's replay is a provably-zero
    gradient — UNLESS the background depends on the ray direction
    (sky_gradient) or the camera/background itself is trainable."""
    return not sky_gradient and rebuild_camera is None


def _compose_edges(step_inner, edge_image_fns, rebuild_camera, cam):
    """Wrap an interior bucketed step with additive visibility-boundary
    gradients: for each zero-valued edge image fn(params, cam, key) ->
    (H, W, 3) (diff/boundary.py, diff/shadow_edge.py), add the VJP of
    sum(fn * ct_img) — exactly the first-order boundary contribution of
    the MSE loss. (The scan backend adds the same images to the render
    BEFORE the loss; the two compositions agree to first order because
    the images are identically zero in the forward pass.)"""
    if not edge_image_fns:
        def step(params, key):
            loss, grads, _ = step_inner(params, key)
            return loss, grads

        return step

    @jax.jit
    def edge_grads(params, key, ct_img):
        def eloss(p):
            if rebuild_camera is None:
                sp, cam_p = p, cam
            else:
                sp = {k: v for k, v in p.items() if k != CAMERA_PARAM_KEY}
                cam_p = rebuild_camera(p[CAMERA_PARAM_KEY])
            tot = jnp.float32(0.0)
            for i, fn in enumerate(edge_image_fns):
                img = fn(sp, cam_p, jax.random.fold_in(key, i))
                tot = tot + jnp.sum(img * ct_img)
            return tot

        return jax.grad(eloss)(params)

    def step(params, key):
        loss, grads, ct_img = step_inner(params, key)
        eg = edge_grads(params, jax.random.fold_in(key, 6070), ct_img)
        grads = jax.tree_util.tree_map(jnp.add, grads, eg)
        return loss, grads

    return step


def _make_kernel_bucketed_grad_fn(
    rebuild,
    cam: Camera,
    target,
    scene_probe,
    *,
    width: int,
    height: int,
    samples_per_pass: int,
    max_depth: int,
    sky_gradient: bool,
    ladder: tuple[int, ...],
    quant: int,
    tape_rows: int,
    rebuild_camera=None,
    fwd_cap: int = 16,
):
    """Kernel-forward variant of the bucketed backend (round-5 VERDICT #1):

    1. ONE persistent-kernel launch traces every (pixel, sample) lane to
       completion at production-kernel speed, recording the (max_depth, N)
       winner tape in-kernel (render_persistent_tape). RNG is the stateless
       counter hash keyed by (seed, sample id, draw index).
    2. Loss / per-lane cotangent / exact path lengths fall out of the lane
       radiance + tape exactly as in the XLA-forward variant.
    3. Per-bucket differentiable replays regenerate their lanes' uniforms
       from the same counters (ops/ctr_rng.py) — bit-identical to what the
       kernel consumed (pinned by tests/test_ktape.py) — so the tape pins
       every discrete decision and the replay radiance reproduces the
       forward estimator.

    The whole forward is one kernel program: there is no phase compaction,
    no tape assembly, and no while_loop whose trip count is the global max
    path length (each kernel tile drains at ITS max — the straggler cost
    the XLA forward could only approximate with host-phased gathers).
    """
    from raytracer_tpu.geometry.intersect import quad_derived
    from raytracer_tpu.ops import ctr_rng
    from raytracer_tpu.ops.persistent_kernel import (
        DEFAULT_ROWS,
        LANES,
        pack_camera_scalars_bg,
        pack_image_table,
        pack_persistent_tables,
        render_persistent_tape,
        scene_supports_persistent,
    )

    assert scene_probe is not None, (
        "forward='kernel' needs scene_probe for static kernel config"
    )
    assert scene_supports_persistent(scene_probe), (
        "scene not supported by the persistent kernel; use forward='xla'"
    )
    n = width * height
    k = samples_per_pass
    total = k * n
    rows = tape_rows or DEFAULT_ROWS
    tile = rows * LANES
    n_phys = -(-total // tile) * tile

    # Static schedule: physical lane p IS sample id p (pixel = p % n), so
    # the kernel outputs need no permutation — tape column / radiance row p
    # is bucketed lane p, and consecutive lanes are consecutive pixels
    # (the coherent strips the kernel's dynamic gather bands want).
    sid_h = np.arange(n_phys, dtype=np.int32)
    pix_h = sid_h % n
    rem0 = jnp.asarray((sid_h < total).astype(np.int32))
    px0 = jnp.asarray((pix_h % width).astype(np.int32))
    py0 = jnp.asarray((pix_h // width).astype(np.int32))
    sid0 = jnp.asarray(sid_h)

    has_image = bool(scene_probe.has_image)
    static_kw = dict(
        width=width,
        height=height,
        rows=rows,
        sky_gradient=sky_gradient,
        has_noise=bool(scene_probe.has_noise),
        has_image=has_image,
        img_h=int(scene_probe.images.shape[1]),
        img_w=int(scene_probe.images.shape[2]),
        bilinear=bool(scene_probe.bilinear_textures),
    )
    # Two-phase forward (round 5): the synchronous tape kernel's tiles
    # drain at their deepest lane, and at depth 50 EVERY 8K-lane tile holds
    # a deep glass path — so the capped phase-1 kernel (depth fwd_cap)
    # runs ~3x fewer iterations, and the ~1% of lanes still alive at the
    # cap are finished in XLA (replay their first fwd_cap bounces from the
    # tape — bit-identical by the counter-RNG identity — then continue with
    # real intersection, recording the remaining tape rows).
    d0 = fwd_cap if 0 < fwd_cap < max_depth else 0

    def _seed_of(key):
        return jax.random.randint(key, (), 0, 2**31 - 1, jnp.int32)

    def _launch(params, key, depth_budget):
        scene, cam_p = _scene_and_camera(params, rebuild, rebuild_camera, cam)
        frame = camera_frame(cam_p, width, height)
        qd = quad_derived(scene)
        sph_p, quad_p, res_p = pack_persistent_tables(scene, qd)
        img_p = pack_image_table(scene) if has_image else None
        rad3, tape, _segs, _iters = render_persistent_tape(
            sph_p, quad_p, res_p,
            pack_camera_scalars_bg(frame, cam_p.background),
            _seed_of(key), rem0, px0, py0, sid0, img_p,
            max_depth=depth_budget, **static_kw,
        )
        return rad3[:, :total].T, tape[:, :total]  # (total,3), (depth,total)

    def _finish(radiance, tape):
        img = radiance.reshape(k, n, 3).mean(0).reshape(height, width, 3)
        loss = jnp.mean((img - target) ** 2)
        ct_img = 2.0 * (img - target) / jnp.float32(img.size)
        pix = jax.lax.broadcasted_iota(jnp.int32, (total, 1), 0)[:, 0] % n
        ct_lane = ct_img.reshape(n, 3)[pix] / jnp.float32(k)
        hitb = tape >= 0
        last_hit = jnp.max(
            jnp.where(
                hitb, jnp.arange(max_depth, dtype=jnp.int32)[:, None], -1
            ),
            axis=0,
        )
        lane_depth = jnp.minimum(last_hit + 2, max_depth)
        return loss, tape, ct_lane, lane_depth, ct_img

    @jax.jit
    def kforward(params, key):
        radiance, tape = _launch(params, key, max_depth)
        return _finish(radiance, tape)

    @jax.jit
    def kfwd_phase1(params, key):
        radiance, tape_d0 = _launch(params, key, d0)
        # Continuation candidates: a hit at the LAST budgeted bounce —
        # true survivors plus terminal hits at that bounce (recomputing
        # the latter in phase 2 reproduces their radiance bit-exactly, so
        # the superset is harmless).
        return radiance, tape_d0, tape_d0[d0 - 1] >= 0

    @jax.jit
    def kfwd_phase2(params, key, radiance, tape_d0, sel, amask):
        scene, cam_p = _scene_and_camera(params, rebuild, rebuild_camera, cam)
        sg = jax.lax.stop_gradient
        scene = sg(scene)
        frame = sg(camera_frame(cam_p, width, height))
        seed = _seed_of(key)
        pixs = sel % n
        cam_uni = ctr_rng.camera_uniforms(seed, sel)
        o, d = camera_rays(frame, pixs % width, pixs // width, cam_uni)
        useq = sg(ctr_rng.bounce_uniform_seq(seed, sel, max_depth))
        st1 = trace(
            scene, sg(o), sg(d), jax.random.PRNGKey(0),
            sg(cam_p.background), max_depth=d0, sky_gradient=sky_gradient,
            uniform_seq=useq[:d0],
            intersect_fn=make_tape_intersect_fn(tape_d0[:, sel]),
            return_state=True,
        )
        st2 = trace(
            scene, st1.origin, st1.direction, jax.random.PRNGKey(0),
            sg(cam_p.background), max_depth=max_depth - d0,
            sky_gradient=sky_gradient, uniform_seq=useq[d0:],
            init_throughput=st1.throughput, init_radiance=st1.radiance,
            init_alive=st1.alive & amask,
            return_tape=True, return_state=True,
        )
        # Duplicate-safe merges (padded slots point at sel[0]): the mask
        # scatters via max (pads write 0), the values via add (pads add 0).
        mask_full = (
            jnp.zeros((total,), jnp.int32).at[sel].max(amask.astype(jnp.int32))
            > 0
        )
        val_full = jnp.zeros((total, 3), jnp.float32).at[sel].add(
            jnp.where(amask[:, None], st2.radiance, 0.0)
        )
        radiance = jnp.where(mask_full[:, None], val_full, radiance)
        tape_hi = jnp.full((max_depth - d0, total), -1, jnp.int32).at[
            :, sel
        ].max(jnp.where(amask[None, :], st2.tape, -1))
        tape = jnp.concatenate([tape_d0, tape_hi], axis=0)
        return _finish(radiance, tape)

    pad_memo = _PadMemo(min(quant, 2048))

    def _padded_idx(depth, ids: np.ndarray):
        padded = pad_memo(depth, ids.size)
        pad = padded - ids.size
        sel = jnp.asarray(
            np.concatenate([ids, np.zeros(pad, np.int64)]), jnp.int32
        )
        amask = jnp.asarray(
            np.concatenate([np.ones(ids.size, bool), np.zeros(pad, bool)])
        )
        return sel, amask

    @jax.jit
    def all_buckets_grad(params, key, ct_lane, tape, bucket_args):
        """Sum of per-bucket VJPs against the forward cotangent (see the
        XLA variant) — uniforms regenerated from the counter RNG instead of
        threefry streams, matching the kernel forward draw-for-draw."""
        seed = _seed_of(key)
        grads = jax.tree_util.tree_map(jnp.zeros_like, params)
        for depth, ba in zip(ladder, bucket_args):
            if ba is None:
                continue
            if depth == 1 and _skip_depth1(sky_gradient, rebuild_camera):
                continue  # provably-zero gradient (see _skip_depth1)
            idx, mask = ba
            pix = idx % n
            tape_b = tape[:depth][:, idx]
            # Counter streams are trivially prefix-stable: each (bounce, j)
            # draw has its own counter.
            useq_b = ctr_rng.bounce_uniform_seq(seed, idx, depth)
            cam_uni = ctr_rng.camera_uniforms(seed, idx)
            ct_rows = ct_lane[idx] * mask[:, None]

            def scalar_loss(p, pix=pix, cam_uni=cam_uni, useq_b=useq_b,
                            tape_b=tape_b, ct_rows=ct_rows, depth=depth):
                scene, cam_p = _scene_and_camera(
                    p, rebuild, rebuild_camera, cam
                )
                frame = camera_frame(cam_p, width, height)
                o, d = camera_rays(frame, pix % width, pix // width, cam_uni)
                radiance = trace(
                    scene,
                    o,
                    d,
                    jax.random.PRNGKey(0),
                    cam_p.background,
                    max_depth=depth,
                    sky_gradient=sky_gradient,
                    differentiable=True,
                    uniform_seq=useq_b,
                    intersect_fn=make_tape_intersect_fn(tape_b),
                    intersect_fn_differentiable=True,
                    # Remat stays ON for every bucket (no-remat measured
                    # 2-3x slower on v5e; see the XLA variant note).
                )
                return jnp.sum(radiance * ct_rows)

            grads = jax.tree_util.tree_map(
                jnp.add, grads, jax.grad(scalar_loss)(params)
            )
        return grads

    def step(params, key):
        if d0:
            radiance, tape_d0, cand = kfwd_phase1(params, key)
            idx = np.flatnonzero(np.asarray(cand))
            sel, amask = _padded_idx("fwd2", idx)
            loss, tape, ct_lane, lane_depth_d, ct_img = kfwd_phase2(
                params, key, radiance, tape_d0, sel, amask
            )
        else:
            loss, tape, ct_lane, lane_depth_d, ct_img = kforward(params, key)
        lane_depth = np.asarray(lane_depth_d)
        remaining = np.arange(total, dtype=np.int64)
        rem_depth = lane_depth
        bucket_args = []
        for depth in ladder:
            in_bucket = rem_depth <= depth
            idx = remaining[in_bucket]
            remaining = remaining[~in_bucket]
            rem_depth = rem_depth[~in_bucket]
            if idx.size == 0:
                bucket_args.append(None)
                continue
            idx_j, amask = _padded_idx(depth, idx)
            bucket_args.append((idx_j, amask.astype(jnp.float32)))
        assert remaining.size == 0, "depth ladder must end at max_depth"
        grads = all_buckets_grad(
            params, key, ct_lane, tape, tuple(bucket_args)
        )
        return loss, grads, ct_img

    return step
