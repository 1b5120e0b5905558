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
# engine begins with one `assemble_pm_tbl` kernel, so the gaps between
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


def _xla_ops_line(trace_dir: str):
    """(meta, events) of the TPU plane's "XLA Ops" line, or None."""
    import glob

    paths = sorted(
        glob.glob(f"{trace_dir}/plugins/profile/*/*.xplane.pb")
    )
    if not paths:
        return None
    try:
        xplane_pb2 = _xplane_pb2()
        xs = xplane_pb2.XSpace()
        with open(paths[-1], "rb") as f:
            xs.ParseFromString(f.read())
    except Exception:
        return None
    for plane in xs.planes:
        if "TPU" not in plane.name:
            continue
        meta = {k: v.name for k, v in plane.event_metadata.items()}
        for line in plane.lines:
            if line.name == "XLA Ops":
                return meta, line.events
    return None


def phase_split_ms(trace_dir: str, lm_iters: int, lm_dim_floor: int,
                   full_pose_dims: tuple = ()):
    """Measured landmark-sharded vs pose-side (replicated) device time per
    LM iteration, from a jax.profiler trace of the point-major engine.

    This is the measured input the SCALING.json ICI projection needs
    (VERDICT r3 weak #1: the 5.0 ms `replicated_ms` was an assumption):
    the distributed engine shards landmarks over the mesh, so every op
    whose tensors carry a landmark-proportional dimension scales ~1/D,
    while pose-sized ops are replicated per device.

    Classifier: XLA fusions are anonymous, but their op text embeds every
    operand/result shape, so an op is LANDMARK-scaled iff any shape
    dimension >= `lm_dim_floor` (for the point-major engine pass
    `nblocks * window`: the second-level segment-sums' input rows -- the
    smallest landmark-proportional dimension; every pose-side tensor is
    <= padded n_opt + window, far below it). Pallas custom-calls are
    classified the same way (their panel outputs carry nblocks).
    Control-flow events (`while`, `conditional`) are INCLUSIVE of their
    bodies and excluded; ops executing fewer than `lm_iters` times
    (once-per-solve setup / final cost) are excluded so the split is the
    steady-state per-iteration cost.

    `full_pose_dims` (optional) further splits the pose side: ops touching
    the FULL pose table (a dim exactly in the given set, e.g.
    {num_poses, num_poses + window}) stay per-device even in the
    pose-sharded distributed engine (parallel/sharded_pm.py) -- the
    candidate-table write and accept select -- while the rest of the pose
    algebra (opt-row retraction, CG vector ops, preconditioner) shards
    1/D. Reported as pose_fixed_ms / pose_shardable_ms.

    Returns dict(landmark_ms, replicated_ms, pose_fixed_ms,
    pose_shardable_ms, device_lm_iter_ms, top_replicated) -- all per LM
    iteration -- or None when the trace has no TPU plane.
    """
    import collections
    import re

    got = _xla_ops_line(trace_dir)
    if got is None:
        return None
    meta, events = got
    agg = collections.Counter()
    cnt = collections.Counter()
    for ev in events:
        nm = meta.get(ev.metadata_id, "?")
        agg[nm] += ev.duration_ps
        cnt[nm] += 1
    landmark_ps = 0
    replicated_ps = 0
    fixed_ps = 0
    full_set = set(full_pose_dims)
    top = collections.Counter()
    for nm, ps in agg.items():
        base = nm.lstrip("%").split(" = ")[0]
        if re.match(r"(while|conditional)[.\d]*$", base):
            continue
        if cnt[nm] < lm_iters:
            continue
        dims = [
            int(d)
            for shape in re.findall(r"\[([\d,]*)\]", nm)
            for d in shape.split(",")
            if d
        ]
        if dims and max(dims) >= lm_dim_floor:
            landmark_ps += ps
        else:
            replicated_ps += ps
            if full_set and any(d in full_set for d in dims):
                fixed_ps += ps
            top[re.sub(r"\.\d+$", "", base)] += ps
    return {
        "landmark_ms": landmark_ps / 1e9 / lm_iters,
        "replicated_ms": replicated_ps / 1e9 / lm_iters,
        "pose_fixed_ms": fixed_ps / 1e9 / lm_iters,
        "pose_shardable_ms": (replicated_ps - fixed_ps) / 1e9 / lm_iters,
        "device_lm_iter_ms": (landmark_ps + replicated_ps) / 1e9 / lm_iters,
        "top_replicated": {
            k: round(v / 1e9 / lm_iters, 4) for k, v in top.most_common(8)
        },
    }


def device_iteration_times_ms(
    trace_dir: str, marker: str = "assemble_pm"
):
    """Per-iteration DEVICE times (ms) from a jax.profiler trace.

    Finds the TPU plane's "XLA Ops" line, takes the start offset of every
    event whose op name contains `marker` (one per LM iteration), and
    returns the consecutive differences; the last iteration is closed by
    the maximum event end time. Returns a list (possibly empty when the
    trace has no TPU plane / marker events -- e.g. CPU backends)."""
    # Degrades to [] rather than crash a completed solve: protoc may be
    # absent from PATH or the tools/ checkout read-only, and this runs
    # AFTER the solve finished (Summary reports iter_time = -1 on []).
    got = _xla_ops_line(trace_dir)
    if got is None:
        return []
    meta, events = got
    starts = []
    end_ps = 0
    for ev in events:
        nm = meta.get(ev.metadata_id, "")
        end_ps = max(end_ps, ev.offset_ps + ev.duration_ps)
        if marker in nm:
            starts.append(ev.offset_ps)
    if not starts:
        return []
    starts.sort()
    bounds = starts + [end_ps]
    return [
        (bounds[i + 1] - bounds[i]) / 1e9 for i in range(len(starts))
    ]
