"""Tracing/profiling harness (SURVEY.md §5).

- `timeit_blocked`: steady-state wall-clock for jitted functions
  (block_until_ready discipline; excludes compile by warming up).
- `trace`: thin wrapper over jax.profiler.trace (TensorBoard/Perfetto);
  used by the CLI --profile flag.
- `annotate`: profiler TraceAnnotation for per-stage cost attribution in
  traces (e.g. "fwht", "denoise", "bp").
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict, Tuple

import jax


def timeit_blocked(fn: Callable, *args, warmup: int = 1, reps: int = 5,
                   **kw) -> Tuple[float, object]:
    """Returns (seconds_per_call, last_output); jit-compile excluded."""
    out = None
    for _ in range(warmup):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps, out


@contextlib.contextmanager
def trace(logdir: str):
    with jax.profiler.trace(logdir):
        yield


def annotate(name: str):
    return jax.profiler.TraceAnnotation(name)


def throughput_report(fn: Callable, args: tuple, bits_per_call: int,
                      reps: int = 5) -> Dict[str, float]:
    """bits/s + latency for a jitted decode callable (BASELINE.md metric)."""
    dt, _ = timeit_blocked(fn, *args, reps=reps)
    return dict(seconds_per_call=dt, bits_per_s=bits_per_call / dt)
