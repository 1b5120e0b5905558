"""Profiling helpers: JAX profiler traces for kernel speed-of-light analysis.

The reference's only profiling is wall-clock StopWatch laps (SURVEY.md §5);
the TPU-native equivalent is a profiler trace (XPlane) that shows per-kernel
HBM/MXU utilization. Usage:

    with trace("/tmp/ba-trace"):
        state = solve(...)
        jax.block_until_ready(state)

then inspect with TensorBoard or xprof.
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context (no-op if the profiler is unavailable)."""
    try:
        jax.profiler.start_trace(log_dir)
        started = True
    except Exception:
        started = False
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass


@contextlib.contextmanager
def wall_timer(label: str, sink=print):
    """StopWatch-style wall timing of a block (reference timer parity)."""
    t0 = time.perf_counter()
    yield
    sink(f"{label}: {(time.perf_counter() - t0) * 1e3:.3f} ms")


def timed_blocked(fn, *args, repeats: int = 10, **kwargs):
    """Median wall time of `fn(*args)` with device completion, in seconds."""
    out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2], out
