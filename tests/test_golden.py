"""Golden regression tests: fixed-seed low-res renders of every reference
scene, pinned to stored image statistics (SURVEY.md §4.3 — the Go reference
cannot run here (no toolchain/network), so the oracle-validated renderer's
own converged statistics are pinned to catch silent behavior regressions).

Regenerate goldens intentionally with:
    python -m tests.test_golden   (writes tests/golden_stats.json)
"""

import json
import os

import numpy as np
import pytest

from raytracer_tpu.render.driver import render_image
from raytracer_tpu.scenes.registry import SCENES, get_scene

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "golden_stats.json")
CFG = dict(width=96, spp=24, max_depth=10)
SEED = 12345

# Scenes deliberately without goldens: rand_spheres_large / quad_field are
# 10K/8K-primitive scale workloads whose CPU renders would dominate the
# suite's runtime; their correctness is covered by the large-scene oracle
# tests (tests/test_large_scene.py) and the clustered-vs-dense bit-identity
# tests (tests/test_persistent_kernel.py), and they share every component
# with rand_spheres / quads, which are pinned.
GOLDEN_EXEMPT = {"rand_spheres_large", "quad_field"}


def _stats(img: np.ndarray) -> dict:
    h, w, _ = img.shape
    probes = [
        (h // 4, w // 4),
        (h // 2, w // 2),
        (3 * h // 4, 3 * w // 4),
        (h // 2, w // 8),
    ]
    return {
        "mean": [round(float(m), 5) for m in img.mean((0, 1))],
        "std": round(float(img.std()), 5),
        "probes": [[round(float(c), 5) for c in img[y, x]] for y, x in probes],
    }


def _render(name):
    scene, cam, settings = get_scene(name, **CFG)
    return np.asarray(render_image(scene, cam, settings, seed=SEED))


def _load():
    with open(GOLDEN_PATH) as f:
        return json.load(f)


@pytest.mark.parametrize("name", sorted(set(SCENES) - GOLDEN_EXEMPT))
def test_golden_stats(name):
    golden = _load()
    assert name in golden, f"scene {name} needs a golden entry (or an exemption)"
    img = _render(name)
    got = _stats(img)
    want = golden[name]
    # Channel means are Monte-Carlo estimates over ~220K samples: tight.
    np.testing.assert_allclose(got["mean"], want["mean"], rtol=0.02, atol=0.004)
    np.testing.assert_allclose(got["std"], want["std"], rtol=0.05, atol=0.01)
    # Individual pixels at 24 spp are noisy: loose but meaningful.
    np.testing.assert_allclose(
        got["probes"], want["probes"], rtol=0.5, atol=0.12
    )


if __name__ == "__main__":
    out = {}
    for name in sorted(set(SCENES) - GOLDEN_EXEMPT):
        out[name] = _stats(_render(name))
        print(name, out[name]["mean"])
    with open(GOLDEN_PATH, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print("wrote", GOLDEN_PATH)
