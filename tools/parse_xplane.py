#!/usr/bin/env python
"""Parse a JAX profiler xplane.pb into per-op device-time aggregates.

The tensorboard-plugin-profile protos bundled in this image are incompatible
with the installed protobuf, so this compiles a minimal xplane schema
(tools/xplane.proto) with protoc on first use and aggregates the TPU device
plane: module time (true device wall) and XLA-op totals grouped by base name.

Usage:
    with jax.profiler.trace("/tmp/trace"): run()
    python tools/parse_xplane.py /tmp/trace
"""

import collections
import glob
import pathlib
import re
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main() -> int:
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/trace"
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    paths = sorted(
        glob.glob(f"{trace_dir}/plugins/profile/*/*.xplane.pb")
    )
    if not paths:
        print(f"no xplane.pb under {trace_dir}")
        return 1
    # Shared protoc-compile helper (single source of truth for the
    # xplane.proto build; see utils/profiling._xplane_pb2).
    from bundle_adjustment_solver_tpu.utils.profiling import _xplane_pb2

    xplane_pb2 = _xplane_pb2()

    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(paths[-1], "rb").read())
    for plane in xs.planes:
        if "TPU" not in plane.name:
            continue
        meta = {k: v.name for k, v in plane.event_metadata.items()}
        for line in plane.lines:
            if line.name == "XLA Modules":
                for e in line.events:
                    print(f"module {meta.get(e.metadata_id, '?')[:60]}: "
                          f"{e.duration_ps / 1e9:.2f} ms device time")
            if line.name != "XLA Ops":
                continue
            cat = collections.Counter()
            catn = collections.Counter()
            for ev in line.events:
                nm = meta.get(ev.metadata_id, "?")
                base = re.sub(r"\.\d+", "", nm.split(" = ")[0].lstrip("%"))
                base = re.sub(r"\d+$", "", base)
                cat[base] += ev.duration_ps
                catn[base] += 1
            print("op totals (while events are inclusive -- don't sum):")
            for name, ps in cat.most_common(top_n):
                print(f"  {ps / 1e9:8.2f} ms  x{catn[name]:<6d} {name}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
