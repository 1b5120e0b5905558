"""Wall-clock timing utilities.

Reference parity: timer::StopWatch and tic()/toc()
(utility/timer.h:13-33, utility/timer.cpp:8-84). Host-side only -- the jitted
solvers keep per-iteration telemetry on-device; this times whole solves and
benchmark sections.
"""

from __future__ import annotations

import time

_tic_start: float | None = None


def tic() -> None:
    """Start the global stopwatch (utility/timer.cpp:8-10)."""
    global _tic_start
    _tic_start = time.perf_counter()


def toc(echo: bool = False) -> float:
    """Milliseconds since `tic` (utility/timer.cpp:12-18)."""
    if _tic_start is None:
        raise RuntimeError("toc() called before tic()")
    elapsed_ms = (time.perf_counter() - _tic_start) * 1e3
    if echo:
        print(f"elapsed: {elapsed_ms:.3f} ms")
    return elapsed_ms


class StopWatch:
    """Named stopwatch with lap times in milliseconds (utility/timer.h:13-33)."""

    def __init__(self, name: str = ""):
        self.name = name
        self._start: float | None = None
        self._latest: float | None = None

    def start(self) -> None:
        now = time.perf_counter()
        self._start = now
        self._latest = now

    def get_lap_time_from_start(self) -> float:
        if self._start is None:
            raise RuntimeError("StopWatch not started")
        return (time.perf_counter() - self._start) * 1e3

    def get_lap_time_from_latest(self) -> float:
        if self._latest is None:
            raise RuntimeError("StopWatch not started")
        now = time.perf_counter()
        lap_ms = (now - self._latest) * 1e3
        self._latest = now
        return lap_ms

    def stop(self) -> float:
        elapsed = self.get_lap_time_from_start()
        self._start = None
        self._latest = None
        return elapsed
