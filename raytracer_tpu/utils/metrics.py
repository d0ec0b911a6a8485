"""Observability: structured render metrics + profiler hooks.

The reference's only observability is a per-scanline Printf and a final
duration print (camera.go:203, main.go:77; SURVEY.md §5). Here: structured
progress (tiles/spp done, rays/s), `jax.profiler` trace capture (TensorBoard
compatible), and a Mrays/s counter based on actually-traced segments.
"""

from __future__ import annotations

import contextlib
import json
import time
from dataclasses import dataclass, field


@dataclass
class RenderMetrics:
    """Accumulates render progress; print or export as JSON lines."""

    total_spp: int
    pixels: int
    start_time: float = field(default_factory=time.perf_counter)
    done_spp: int = 0
    traced_segments: int = 0
    wavefront_iters: int = 0

    def update(self, spp_done: int, segments: int = 0, iters: int = 0):
        self.done_spp = spp_done
        self.traced_segments += int(segments)
        self.wavefront_iters += int(iters)

    @property
    def elapsed(self) -> float:
        return time.perf_counter() - self.start_time

    def snapshot(self) -> dict:
        dt = max(self.elapsed, 1e-9)
        out = {
            "spp": f"{self.done_spp}/{self.total_spp}",
            "wall_s": round(dt, 3),
            "camera_mrays_per_s": round(self.pixels * self.done_spp / dt / 1e6, 3),
        }
        if self.traced_segments:
            out["traced_mrays_per_s"] = round(self.traced_segments / dt / 1e6, 3)
        if self.wavefront_iters:
            out["wavefront_iters"] = self.wavefront_iters
        return out

    def log(self) -> None:
        print(json.dumps(self.snapshot()), flush=True)


@contextlib.contextmanager
def profiler_trace(log_dir: str | None):
    """Capture a jax.profiler trace around the block when log_dir is set
    (view with TensorBoard). Replacement for the reference's pprof span
    (main.go:52-73)."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
