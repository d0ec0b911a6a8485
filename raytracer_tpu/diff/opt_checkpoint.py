"""Optimizer-state checkpoint/resume for inverse-rendering runs.

SURVEY.md §5 (checkpoint entry) names "inverse-rendering optimizer state
likewise" as a rebuild requirement next to render accumulators; the
reference itself has no resume story at all (file.go:9-18 truncates output
up front). This module gives gradient-descent scene recovery the same
fail-stop + resume semantics render/checkpoint.py gives renders:

* the checkpoint holds (params, opt_state, step, seed) — everything the
  optimization's state machine carries;
* per-step randomness is derived as fold_in(PRNGKey(seed), step), so the
  key trajectory is a pure function of the step index and a resumed run
  reproduces the uninterrupted trajectory BIT-IDENTICALLY (tested in
  tests/test_checkpoint.py);
* the same fingerprint/refusal machinery as render checkpoints
  (render/checkpoint.config_fingerprint style): resuming under a different
  scene/target/optimizer configuration raises instead of silently blending
  incompatible trajectories;
* saves are atomic (tmp + os.replace) so a kill mid-save cannot corrupt
  the previous checkpoint.
"""

from __future__ import annotations

import hashlib
import os
from typing import Any, NamedTuple

import numpy as np
import jax

OPT_CHECKPOINT_VERSION = 1


def opt_fingerprint(*parts) -> str:
    """Hash arbitrary pytrees/values that determine the optimization
    trajectory: initial scene/params, camera, target image, loss settings,
    optimizer hyperparameters, seed. Array leaves hash dtype+shape+bytes;
    treedefs are hashed so static structure changes also refuse."""
    h = hashlib.sha256()
    for part in parts:
        leaves, treedef = jax.tree_util.tree_flatten(part)
        h.update(str(treedef).encode())
        for leaf in leaves:
            arr = np.asarray(leaf)
            h.update(str(arr.dtype).encode())
            h.update(str(arr.shape).encode())
            h.update(arr.tobytes())
    return h.hexdigest()


class OptCheckpoint(NamedTuple):
    params: Any  # pytree
    opt_state: Any  # pytree
    step: int  # next step to run
    seed: int
    config_hash: str


def save_opt_checkpoint(path: str, ckpt: OptCheckpoint) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    p_leaves = jax.tree_util.tree_leaves(ckpt.params)
    s_leaves = jax.tree_util.tree_leaves(ckpt.opt_state)
    payload = {f"p{i}": np.asarray(x) for i, x in enumerate(p_leaves)}
    payload.update({f"s{i}": np.asarray(x) for i, x in enumerate(s_leaves)})
    tmp = path + ".tmp"
    np.savez(
        tmp,
        version=OPT_CHECKPOINT_VERSION,
        step=ckpt.step,
        seed=ckpt.seed,
        config_hash=np.array(ckpt.config_hash),
        n_params=len(p_leaves),
        n_state=len(s_leaves),
        **payload,
    )
    os.replace(tmp + ".npz", path)


def load_opt_checkpoint(
    path: str, *, params_like, opt_state_like, config_hash: str
) -> OptCheckpoint | None:
    """Load and validate; None if the file does not exist.

    `params_like` / `opt_state_like` supply the treedefs (the caller's
    freshly-initialized params and opt.init(params)); leaf count, shapes
    and dtypes must match or the load refuses — same loud-refusal contract
    as render/checkpoint.load_checkpoint."""
    if not os.path.exists(path):
        return None
    with np.load(path) as z:
        if int(z["version"]) != OPT_CHECKPOINT_VERSION:
            raise ValueError(
                f"optimizer checkpoint {path} has version {int(z['version'])},"
                f" this build writes {OPT_CHECKPOINT_VERSION}; finish it with"
                " the old build or delete it to restart"
            )
        if str(z["config_hash"]) != config_hash:
            raise ValueError(
                f"optimizer checkpoint {path} was written under a different "
                "scene/target/optimizer configuration; refusing to resume "
                "(delete it to restart)"
            )
        p_leaves, p_def = jax.tree_util.tree_flatten(params_like)
        s_leaves, s_def = jax.tree_util.tree_flatten(opt_state_like)
        if int(z["n_params"]) != len(p_leaves) or int(z["n_state"]) != len(
            s_leaves
        ):
            raise ValueError(
                f"optimizer checkpoint {path} leaf counts do not match the "
                "current params/optimizer structure; refusing to resume"
            )

        def restore(prefix, like_leaves):
            out = []
            for i, like in enumerate(like_leaves):
                arr = z[f"{prefix}{i}"]
                want = np.asarray(like)
                if arr.shape != want.shape or arr.dtype != want.dtype:
                    raise ValueError(
                        f"optimizer checkpoint {path} leaf {prefix}{i} is "
                        f"{arr.dtype}{arr.shape}, expected "
                        f"{want.dtype}{want.shape}; refusing to resume"
                    )
                out.append(arr)
            return out

        params = jax.tree_util.tree_unflatten(p_def, restore("p", p_leaves))
        opt_state = jax.tree_util.tree_unflatten(
            s_def, restore("s", s_leaves)
        )
        return OptCheckpoint(
            params=params,
            opt_state=opt_state,
            step=int(z["step"]),
            seed=int(z["seed"]),
            config_hash=str(z["config_hash"]),
        )


def run_optimization(
    step_fn,
    params,
    opt_state,
    *,
    n_steps: int,
    seed: int,
    fingerprint: str = "",
    checkpoint_path: str | None = None,
    save_every: int = 10,
    max_steps_this_run: int | None = None,
    on_step=None,
):
    """Deterministic checkpointed optimization loop.

    `step_fn(params, opt_state, key) -> (params, opt_state, loss)` (the
    make_inverse_renderer contract). Step i always uses
    fold_in(PRNGKey(seed), i), so the trajectory depends only on
    (initial state, seed) and resuming is bit-identical to never stopping.

    Returns (params, opt_state, next_step, losses-this-run). With
    `checkpoint_path`, resumes from the file when present (refusing on
    config mismatch) and saves every `save_every` steps plus at the end.
    `max_steps_this_run` stops early after that many steps (testing /
    cooperative preemption — the checkpoint holds the state)."""
    start = 0
    if checkpoint_path:
        ck = load_opt_checkpoint(
            checkpoint_path,
            params_like=params,
            opt_state_like=opt_state,
            config_hash=fingerprint,
        )
        if ck is not None:
            params, opt_state, start = ck.params, ck.opt_state, ck.step
    key = jax.random.PRNGKey(seed)
    losses = []
    ran = 0
    step = start
    while step < n_steps:
        if max_steps_this_run is not None and ran >= max_steps_this_run:
            break
        params, opt_state, loss = step_fn(
            params, opt_state, jax.random.fold_in(key, step)
        )
        ran += 1
        losses.append(float(loss))
        step += 1
        if on_step is not None:
            on_step(step - 1, losses[-1])
        if checkpoint_path and (
            step % save_every == 0 or step == n_steps
        ):
            save_opt_checkpoint(
                checkpoint_path,
                OptCheckpoint(
                    params=params,
                    opt_state=opt_state,
                    step=step,
                    seed=seed,
                    config_hash=fingerprint,
                ),
            )
    if checkpoint_path and ran and step % save_every != 0 and step != n_steps:
        save_opt_checkpoint(
            checkpoint_path,
            OptCheckpoint(
                params=params,
                opt_state=opt_state,
                step=step,
                seed=seed,
                config_hash=fingerprint,
            ),
        )
    return params, opt_state, step, losses
