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

Trainables: scene parameters (params -> rebuild(params) -> Scene).
Camera gradients are not routed through this backend (use the scan
backend for camera optimization).

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


def default_depth_ladder(max_depth: int) -> tuple[int, ...]:
    """Static bucket depths: 1 (the sky-miss lanes — no scene hit at all,
    a large fraction of any sky-lit image) then powers of two up to
    max_depth (always included)."""
    ladder = [1]
    d = 2
    while d < max_depth:
        ladder.append(d)
        d *= 2
    ladder.append(max_depth)
    return tuple(ladder)


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
):
    """Build `step(params, key) -> (loss, grads)` with depth-bucketed
    backward. `rebuild(params) -> Scene` as from diff.grad.split_scene."""
    n = width * height
    k = samples_per_pass
    total = k * n
    ladder = depths or default_depth_ladder(max_depth)
    assert ladder[-1] == max_depth, (ladder, max_depth)

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
        scene = rebuild(params)
        frame = camera_frame(cam, width, height)
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
            sg(cam.background), max_depth=d0, sky_gradient=sky_gradient,
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
        scene = rebuild(params)
        _, key_u = jax.random.split(key)
        useq = jnp.transpose(
            _lane_uniforms(key_u, sel, d_hi)[:, d_lo:d_hi, :], (1, 0, 2)
        )
        sg = jax.lax.stop_gradient
        st = trace(
            sg(scene), sg(prev_o[src]), sg(prev_d[src]),
            jax.random.PRNGKey(0), sg(cam.background),
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
        return loss, ct_lane, lane_depth

    def _pad_size(sz: int) -> int:
        """Geometric padding ladder (quant, 2*quant, 4*quant, ...): a
        handful of distinct compiled shapes, stable across optimization
        steps even as bucket populations drift (arithmetic padding caused
        mid-measurement recompiles — ~minute-scale on the remote-compile
        tunnel)."""
        p = quant
        while p < sz:
            p *= 2
        return p

    def _padded_idx(ids: np.ndarray):
        padded = _pad_size(ids.size)
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
            sel, amask = _padded_idx(orig)
            src, _ = _padded_idx(pos)
            radiance, tape, alive_d, o_d, d_d, t_d = phase_next(
                params, key, sel, src, o_d, d_d, t_d, radiance, tape,
                amask, d_lo=d_lo, d_hi=d_hi,
            )
            alive2 = np.asarray(alive_d)[: orig.size]
            pos = np.flatnonzero(alive2)
            orig = orig[alive2]
            d_lo = d_hi
        loss, ct_lane, lane_depth = loss_ct_depth(radiance, tape)
        return loss, tape, ct_lane, np.asarray(lane_depth)

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
        frame = camera_frame(cam, width, height)
        cam_uni_all = jax.random.uniform(key_cam, (total, 4), jnp.float32)

        grads = jax.tree_util.tree_map(jnp.zeros_like, params)
        for depth, ba in zip(ladder, bucket_args):
            if ba is None:
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
                scene = rebuild(p)
                o, d = camera_rays(
                    frame, pix % width, pix // width, cam_uni_all[idx]
                )
                radiance = trace(
                    scene,
                    o,
                    d,
                    jax.random.PRNGKey(0),
                    cam.background,
                    max_depth=depth,
                    sky_gradient=sky_gradient,
                    differentiable=True,
                    uniform_seq=useq_b,
                    intersect_fn=make_tape_intersect_fn(tape_b),
                    intersect_fn_differentiable=True,
                )
                return jnp.sum(radiance * ct_rows)

            grads = jax.tree_util.tree_map(
                jnp.add, grads, jax.grad(scalar_loss)(params)
            )
        return grads

    def step(params, key):
        loss, tape, ct_lane, lane_depth = forward(params, key)
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
            idx_j, amask = _padded_idx(idx)
            bucket_args.append((idx_j, amask.astype(jnp.float32)))
        assert remaining.size == 0, "depth ladder must end at max_depth"
        grads = all_buckets_grad(
            params, key, ct_lane, tape, tuple(bucket_args)
        )
        return loss, grads

    return step
