"""Profiling hooks (SURVEY.md section 5.1: the reference has only
``tic``/``toc``; the build provides ``jax.profiler`` traces and simple
per-call timing)."""

from __future__ import annotations

import contextlib
import time
from typing import Iterator


@contextlib.contextmanager
def trace(logdir: str) -> Iterator[None]:
    """Capture a ``jax.profiler`` trace viewable in TensorBoard/Perfetto."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Timer:
    """Blocking wall-clock timer for jitted callables (forces
    ``block_until_ready`` so device work is actually measured)."""

    def __init__(self):
        self.records: dict[str, list[float]] = {}

    @contextlib.contextmanager
    def measure(self, name: str):
        import jax

        t0 = time.perf_counter()
        box = {}
        yield box
        if "out" in box:
            jax.block_until_ready(box["out"])
        self.records.setdefault(name, []).append(
            time.perf_counter() - t0)

    def summary(self) -> dict[str, dict[str, float]]:
        out = {}
        for k, v in self.records.items():
            out[k] = {"n": len(v), "total_s": sum(v),
                      "mean_ms": 1e3 * sum(v) / len(v),
                      "min_ms": 1e3 * min(v)}
        return out
