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


# ---------------------------------------------------------------------------
# Device-clock per-iteration times from an xplane trace (VERDICT r2 task 9)
# ---------------------------------------------------------------------------
#
# Through a device tunnel, chunked-dispatch wall timing reports
# dispatch+fetch (~40-85 ms/iteration) instead of device time. The profiler
# trace carries true device timestamps: each LM iteration of the point-major
# engine begins with one `assemble_pm_partials` kernel, so the gaps between
# consecutive assembly-kernel starts on the TPU plane ARE the per-iteration
# device times (the final iteration closes at the end of the last event).


def _xplane_pb2():
    """Compile tools/xplane.proto with protoc on first use (the bundled
    tensorboard protos are incompatible with the installed protobuf)."""
    import os
    import pathlib
    import subprocess
    import sys

    os.environ.setdefault(
        "PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python"
    )
    tools = pathlib.Path(__file__).resolve().parents[2] / "tools"
    out = tools / "_xplane_pb"
    if not (out / "xplane_pb2.py").exists():
        out.mkdir(exist_ok=True)
        subprocess.run(
            ["protoc", f"--proto_path={tools}", f"--python_out={out}",
             str(tools / "xplane.proto")],
            check=True,
        )
    if str(out) not in sys.path:
        sys.path.insert(0, str(out))
    import xplane_pb2

    return xplane_pb2


def device_iteration_times_ms(
    trace_dir: str, marker: str = "assemble_pm_partials"
):
    """Per-iteration DEVICE times (ms) from a jax.profiler trace.

    Finds the TPU plane's "XLA Ops" line, takes the start offset of every
    event whose op name contains `marker` (one per LM iteration), and
    returns the consecutive differences; the last iteration is closed by
    the maximum event end time. Returns a list (possibly empty when the
    trace has no TPU plane / marker events -- e.g. CPU backends)."""
    import glob

    paths = sorted(
        glob.glob(f"{trace_dir}/plugins/profile/*/*.xplane.pb")
    )
    if not paths:
        return []
    try:
        # Degrade, never crash a completed solve: protoc may be absent from
        # PATH or the tools/ checkout read-only, and this runs AFTER the
        # solve finished (Summary reports iter_time = -1 on []).
        xplane_pb2 = _xplane_pb2()
        xs = xplane_pb2.XSpace()
        with open(paths[-1], "rb") as f:
            xs.ParseFromString(f.read())
    except Exception:
        return []
    for plane in xs.planes:
        if "TPU" not in plane.name:
            continue
        meta = {k: v.name for k, v in plane.event_metadata.items()}
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            starts = []
            end_ps = 0
            for ev in line.events:
                nm = meta.get(ev.metadata_id, "")
                end_ps = max(end_ps, ev.offset_ps + ev.duration_ps)
                if marker in nm:
                    starts.append(ev.offset_ps)
            if not starts:
                continue
            starts.sort()
            bounds = starts + [end_ps]
            return [
                (bounds[i + 1] - bounds[i]) / 1e9
                for i in range(len(starts))
            ]
    return []
