"""Profiling: frame-time statistics and JAX profiler traces.

Fills the tracing/profiling gap called out in SURVEY.md section 5 (the
reference has none; its FPS panel is hidden). FrameStats feeds the status
bar / bench; trace() wraps jax.profiler for TensorBoard-compatible device
traces of render bursts.
"""

from __future__ import annotations

import contextlib
import time
from collections import deque
from typing import Optional


class FrameStats:
    """Rolling frame-time statistics (for the status bar and bench)."""

    def __init__(self, window: int = 60):
        self.times = deque(maxlen=window)
        self._last: Optional[float] = None

    def tick(self) -> None:
        now = time.perf_counter()
        if self._last is not None:
            self.times.append(now - self._last)
        self._last = now

    def reset(self) -> None:
        self.times.clear()
        self._last = None

    @property
    def fps(self) -> float:
        if not self.times:
            return 0.0
        return len(self.times) / sum(self.times)

    @property
    def frame_ms(self) -> float:
        if not self.times:
            return 0.0
        return sum(self.times) / len(self.times) * 1000.0

    def mrays_per_s(self, rays_per_frame: int) -> float:
        return self.fps * rays_per_frame / 1e6

    def status_text(self, rays_per_frame: int = 0) -> str:
        txt = f"{self.frame_ms:.1f} ms ({self.fps:.1f} FPS)"
        if rays_per_frame:
            txt += f" {self.mrays_per_s(rays_per_frame):.0f} Mray/s"
        return txt


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/moonrtx_trace"):
    """Capture a device trace of the enclosed block (TensorBoard format)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    """Named region in device traces."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield
