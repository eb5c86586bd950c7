"""Tracing / profiling harness (SURVEY.md §5.1 — absent in the reference).

Two tools:
- `timed`: wall-clock timing of jitted fns with proper device sync
  (jax.block_until_ready), reporting compile time separately from steady
  state and RTF against an audio duration.
- `xla_trace`: context manager capturing an XLA profiler trace viewable in
  TensorBoard / Perfetto.
"""
from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass
from typing import Callable


@dataclass
class Timing:
    compile_s: float
    mean_ms: float
    p50_ms: float
    p95_ms: float
    iters: int

    def rtf(self, audio_seconds: float) -> float:
        """Real-time factor: how many x faster than real time."""
        return audio_seconds / (self.mean_ms / 1000.0)

    def __str__(self):
        return (f"compile {self.compile_s:.1f}s | mean {self.mean_ms:.3f} ms "
                f"p50 {self.p50_ms:.3f} p95 {self.p95_ms:.3f} ({self.iters} iters)")


def timed(fn: Callable, *args, iters: int = 20, warmup: int = 1) -> Timing:
    """Time a device function with sync; first call measured as compile."""
    import jax
    import numpy as np

    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0
    for _ in range(max(warmup - 1, 0)):
        out = fn(*args)
    jax.block_until_ready(out)

    samples = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        samples.append((time.perf_counter() - t0) * 1000.0)
    samples = np.asarray(samples)
    return Timing(compile_s=compile_s, mean_ms=float(samples.mean()),
                  p50_ms=float(np.percentile(samples, 50)),
                  p95_ms=float(np.percentile(samples, 95)), iters=iters)


@contextlib.contextmanager
def xla_trace(log_dir: str):
    """Capture an XLA profiler trace into log_dir (TensorBoard-viewable)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
