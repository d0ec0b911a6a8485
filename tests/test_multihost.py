"""Multi-HOST (multi-process) rendering: the real scripts/run_multihost.py
flow — jax.distributed.initialize + global mesh + cross-process collectives —
executed as 2 local CPU processes of 4 virtual devices each (gloo over
localhost standing in for DCN). This is the closest a single machine gets to
a pod slice; only the transport differs."""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "scripts", "run_multihost.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_render_matches_single(tmp_path):
    out = str(tmp_path / "mh.png")
    port = _free_port()
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    procs = [
        subprocess.Popen(
            [
                sys.executable, SCRIPT, "--scene", "quads", "--spp", "8",
                "--width", "96", "--out", out,
                "--coordinator", f"localhost:{port}",
                "--num-processes", "2", "--process-id", str(pid),
                "--local-devices", "4",
            ],
            cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for pid in (0, 1)
    ]
    outs = [p.communicate(timeout=280)[0].decode() for p in procs]
    assert all(p.returncode == 0 for p in procs), outs
    assert os.path.exists(out), outs

    import imageio.v3 as iio

    from raytracer_tpu.render.driver import render_image
    from raytracer_tpu.render.postprocess import to_u8
    from raytracer_tpu.scenes.registry import get_scene

    mh = iio.imread(out).astype(np.float32) / 255.0
    scene, cam, settings = get_scene("quads", spp=8, width=96)
    ref = np.asarray(
        to_u8(render_image(scene, cam, settings, seed=0, regenerative=False))
    ).astype(np.float32) / 255.0
    np.testing.assert_allclose(mh.mean((0, 1)), ref.mean((0, 1)), atol=0.03)
