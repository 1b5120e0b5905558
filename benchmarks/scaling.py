#!/usr/bin/env python
"""Scaling-efficiency harness for the distributed full-BA solver.

BASELINE.md's north star: >= 70% scaling efficiency on 2+ hosts for the
10k-pose / 1M-landmark problem. Only one real chip is reachable from this
environment, so the artifact this writes (SCALING.json) combines:

1. **Weak scaling on the virtual mesh** (default mode): the per-device
   problem (landmarks + observations per device) is held CONSTANT while the
   device count grows, so wall time growth directly measures parallel
   overhead even on virtual CPU devices -- unlike the strong-scaling of a
   fixed small problem, whose per-device work shrinks below the
   fixed-overhead floor and reads as a refutation (the round-2 artifact's
   9% figure; kept runnable via --mode strong, clearly labeled).
2. **An ICI-time projection for real v5e meshes**: the engine's measured
   single-chip per-LM-iteration phase split (landmark-sharded kernel time
   vs replicated pose-side time, PERF.md) combined with the exact psum
   byte counts (`comm_volume_model`) and v5e ICI ring bandwidth gives the
   projected efficiency at 2-32 chips -- the quantity the north star is
   about, computed from measured inputs rather than virtual-mesh noise.

Usage:
    JAX_PLATFORMS=cpu PYTHONPATH= \
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python benchmarks/scaling.py [--mode weak|strong] [--impl cg|pm]
"""

import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

# --- ICI projection constants (documented assumptions) ---------------------
# TPU v5e: 4 ICI links/chip at ~100 GB/s bidirectional each (public spec:
# 1,600 Gbps interchip bandwidth per chip). A psum (all-reduce) of S bytes
# on a bidirectional ring moves 2*S*(n-1)/n bytes through each chip over 2
# directions => effective time ~ 2*S*(n-1)/n / RING_BW. We use a
# conservative single-direction ring figure and a per-step latency.
ICI_RING_BW = 9e10  # bytes/s usable per ring direction pair (conservative)
ICI_LATENCY_PER_PSUM = 5e-6  # seconds software+hop latency per collective

# --- DCN (cross-slice) tier constants (VERDICT r4 #4) ----------------------
# Within one v5e slice every host rides ICI (the projection above covers
# "2+ hosts" up to the 256-chip slice bound). ACROSS slices, collectives
# cross the data-center network through each host's NIC. Stated
# assumptions, conservative ends of public figures:
CHIPS_PER_HOST = 8  # v5e: 8 chips per host machine
DCN_BW_PER_HOST = 12.5e9  # bytes/s (100 Gbps NIC per host)
DCN_LATENCY_PER_COLLECTIVE = 25e-6  # s software+switch latency per hop

# Measured single-chip flagship phase split at 10k poses / 1M landmarks
# (benchmarks/flagship_profile.json, refreshed by profile_flagship.py;
# these constants are the round-4 capture, used only when that file is
# unreadable):
#   - landmark device time (assembly + matvec + cost kernels and every op
#     with a landmark-proportional dim): scales ~1/n over the mesh;
#   - pose-side time, split into the part the pose-sharded engine
#     partitions 1/n (second-level finish, preconditioner, CG algebra,
#     retraction) and the per-device fixed residue (full-table candidate
#     write + accept select).
FLAGSHIP_DEFAULTS = {
    "lm_iter_ms": 18.2,
    "landmark_ms": 15.07,
    "pose_shardable_ms": 1.0,
    "pose_fixed_ms": 0.34,
    "cg_per_lm": 4.55,
}


def _flagship_measured():
    """Measured phase-split inputs for the ICI projection.

    Prefers benchmarks/flagship_profile.json (written by
    profile_flagship.py on the real chip in its default configuration) so
    a bench recapture refreshes the projection mechanically; falls back to
    the documented constants above. Returns (prof dict, source)."""
    import json
    import os

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "flagship_profile.json")
    try:
        with open(path) as f:
            prof = json.load(f)
        keys = ("lm_iter_ms", "landmark_ms", "pose_shardable_ms",
                "pose_fixed_ms", "cg_per_lm")
        if not all(k in prof for k in keys):
            raise KeyError("stale flagship_profile.json (missing split)")
        return {k: float(prof[k]) for k in keys}, \
            "benchmarks/flagship_profile.json"
    except (OSError, KeyError, ValueError):
        return dict(FLAGSHIP_DEFAULTS), "module constants (round-4 capture)"


def ici_projection(num_opt_poses: int, prof: dict, device_counts,
                   pose_sharded: bool = True) -> list[dict]:
    """Projected strong-scaling efficiency of the sharded PM engine on a
    real v5e ICI mesh, from the MEASURED single-chip phase split
    (benchmarks/flagship_profile.json -- landmark-scaled, pose-shardable,
    and per-device-fixed device time) plus modeled collectives
    (`comm_volume_model`'s exact payload bytes, ring-transit factors, and
    a per-collective latency).

    pose_sharded=True models the default engine (pose algebra partitioned
    1/n; per-CG all-gather + reduce-scatter); False models the round-3
    replicated-pose program (whole pose side constant per device).
    """
    from bundle_adjustment_solver_tpu.parallel.sharded_pm import (
        comm_volume_model,
    )

    landmark = prof["landmark_ms"]
    shardable = prof["pose_shardable_ms"]
    fixed = prof["pose_fixed_ms"]
    cg_per_lm = prof["cg_per_lm"]
    t1 = landmark + shardable + fixed  # single-device DEVICE time
    rows = []
    for n in device_counts:
        model = comm_volume_model(
            num_opt_poses, cg_per_lm, pose_sharded=pose_sharded,
            num_shards=n,
        )
        if n == 1:
            comm_ms = 0.0
        else:
            comm_ms = (
                model["ring_transit_bytes_per_lm_iter"] / ICI_RING_BW
                + model["collectives_per_lm_iter"] * ICI_LATENCY_PER_PSUM
            ) * 1e3
        if pose_sharded:
            t = (landmark + shardable) / n + fixed + comm_ms
        else:
            t = landmark / n + shardable + fixed + comm_ms
        rows.append({
            "devices": n,
            "lm_iter_ms": round(t, 3),
            "comm_ms": round(comm_ms, 4),
            "speedup": round(t1 / t, 3),
            "efficiency": round(t1 / t / n, 4),
            "ideal_lm_iter_ms": round(t1 / n, 3),
        })
    return rows


def dcn_projection(num_opt_poses: int, prof: dict, configs,
                   latency_per_collective: float | None = None,
                   label: str = "modeled") -> dict:
    """Two-level (ICI within slice, DCN across slices) projection of the
    pose-sharded engine's per-LM-iteration time (VERDICT r4 #4: the
    single-tier ICI model covers multi-host only within one slice).

    `configs` is a list of (slices, chips_per_slice). Hierarchical
    collective decomposition, per collective of payload B over S slices
    of d chips:

      - intra-slice phases ride ICI exactly as the single-tier model
        (ring-transit factors from `comm_volume_model` at D = S*d);
      - the cross-slice phase moves ~2*B*(S-1)/S bytes per slice (the
        payload is already reduce-scattered to B/d per chip; the d chips
        of a slice together ship B per ring direction) through the
        slice's AGGREGATE NIC bandwidth (d / CHIPS_PER_HOST hosts x
        DCN_BW_PER_HOST), plus one DCN latency per collective.

    `latency_per_collective` overrides the modeled DCN latency -- pass
    the MEASURED Gloo median from benchmarks/multihost_gloo.json for the
    worst-case software-stack anchor."""
    from bundle_adjustment_solver_tpu.parallel.sharded_pm import (
        comm_volume_model,
    )

    landmark = prof["landmark_ms"]
    shardable = prof["pose_shardable_ms"]
    fixed = prof["pose_fixed_ms"]
    cg_per_lm = prof["cg_per_lm"]
    t1 = landmark + shardable + fixed
    lat = (DCN_LATENCY_PER_COLLECTIVE if latency_per_collective is None
           else latency_per_collective)
    rows = []
    for S, d in configs:
        n = S * d
        model = comm_volume_model(
            num_opt_poses, cg_per_lm, pose_sharded=True, num_shards=n,
        )
        ici_ms = (
            model["ring_transit_bytes_per_lm_iter"] / ICI_RING_BW
            + model["collectives_per_lm_iter"] * ICI_LATENCY_PER_PSUM
        ) * 1e3 if n > 1 else 0.0
        if S > 1:
            slice_nic_bw = DCN_BW_PER_HOST * max(1, d // CHIPS_PER_HOST)
            dcn_ms = (
                2.0 * model["total_bytes_per_lm_iter"] * (S - 1) / S
                / slice_nic_bw
                + model["collectives_per_lm_iter"] * lat
            ) * 1e3
        else:
            dcn_ms = 0.0
        t = (landmark + shardable) / n + fixed + ici_ms + dcn_ms
        rows.append({
            "slices": S,
            "chips_per_slice": d,
            "devices": n,
            "lm_iter_ms": round(t, 3),
            "ici_ms": round(ici_ms, 4),
            "dcn_ms": round(dcn_ms, 4),
            "efficiency": round(t1 / t / n, 4),
        })
    return {
        "latency_per_collective_s": lat,
        "latency_source": label,
        "rows": rows,
    }


def hlo_invariance_check(device_counts=(2, 4, 8)) -> dict:
    """Deterministic sharding regression gate on the virtual mesh
    (VERDICT r3 weak #2: wall time on a 1-core rig cannot detect a
    sharding regression -- compiled-HLO structure can).

    Compiles the pose-sharded PM program at each shard count and checks,
    from the optimized HLO text:

      1. the multiset of collective op KINDS is identical across shard
         counts (someone adding a per-iteration collective changes it);
      2. every collective payload is one of the expected pose-system
         shapes (panel reduce-scatter, CG gather/scatter, pose-row
         gather) or a scalar psum -- a collective carrying a
         landmark-sized operand (a replicated landmark computation, the
         exact regression this engine exists to avoid) fails the set
         membership.

    Returns the artifact dict; raises AssertionError on regression.
    """
    import numpy as np
    import re

    import jax

    from bundle_adjustment_solver_tpu.models.problem import (
        finalized_from_arrays,
    )
    from bundle_adjustment_solver_tpu.options import (
        ConvergenceHandle,
        IterationHandle,
        Options,
        SolverType,
    )
    from bundle_adjustment_solver_tpu.parallel.sharded_pm import (
        _pose_shard_rows,
        _solve_sharded_pm_jax,
    )
    from bundle_adjustment_solver_tpu.solvers.full_ba_pm import (
        pm_from_finalized,
    )
    from bundle_adjustment_solver_tpu.utils.synthetic import (
        corridor_ba_problem,
    )

    prob = corridor_ba_problem(
        num_poses=96, num_points=48_000, window=6, seed=7
    )
    fixed = np.zeros(96, dtype=bool)
    fixed[prob.fixed_pose_ids] = True
    problem, shape = finalized_from_arrays(
        prob.cameras, prob.poses_initial, prob.points_initial,
        prob.obs_camera, prob.obs_pose, prob.obs_point, prob.obs_pixel,
        fixed_pose_mask=fixed,
    )
    options = Options(
        solver_type=SolverType.LEVENBERG_MARQUARDT,
        convergence_handle=ConvergenceHandle(0.0, 0.0),
        iteration_handle=IterationHandle(3),
        reduced_system="cg",
        cg_max_iterations=10,
        cg_tolerance=1e-8,
    )
    kinds_by_n = {}
    payload_rows = []
    for n in device_counts:
        pm, pshape = pm_from_finalized(
            problem, shape, host=None, pad_blocks_to=n
        )
        compiled = _solve_sharded_pm_jax.lower(
            pm, pshape, problem.rig, problem.R_cw, problem.t_cw,
            problem.opt_pose_idx, options, n, interpret=True,
            pose_sharded=True,
        ).compile()
        txt = compiled.as_text()
        colls = re.findall(
            r"(\w[\w.\-]*)\s*=\s*\S*\s*"
            r"(all-reduce|all-gather|reduce-scatter|collective-permute)"
            r"[\w-]*\(",
            txt,
        )
        kinds = {}
        for _, kind in colls:
            kinds[kind] = kinds.get(kind, 0) + 1
        kinds_by_n[n] = kinds

        # Payload membership: result shapes of collective ops.
        Nl = _pose_shard_rows(shape.num_opt_poses, n)
        Ns = Nl * n
        allowed = {
            r * c for r in (Nl, Ns) for c in (6, 16, 40, 64)
        }
        shapes = re.findall(
            r"=\s*\(?\w+\[([\d,]*)\][^=]*?"
            r"(?:all-reduce|all-gather|reduce-scatter|collective-permute)",
            txt,
        )
        for s in shapes:
            elems = 1
            for d in s.split(","):
                if d:
                    elems *= int(d)
            ok = elems <= 8 or elems in allowed
            payload_rows.append(
                {"devices": n, "elements": elems, "ok": bool(ok)}
            )
            assert ok, (
                f"unexpected collective payload of {elems} elements at "
                f"{n} shards (allowed pose-system payloads: "
                f"{sorted(allowed)}; scalars <= 8). A landmark-sized "
                "collective means a landmark computation got replicated."
            )
    base = kinds_by_n[device_counts[0]]
    for n, kinds in kinds_by_n.items():
        assert kinds == base, (
            f"collective structure changed with shard count: {n} shards "
            f"-> {kinds}, {device_counts[0]} shards -> {base}"
        )
    return {
        "problem": {"poses": 96, "points": 48_000, "window": 6},
        "collective_kinds_per_program": base,
        "payloads_checked": len(payload_rows),
        "interpretation": (
            "compiled-HLO structure gate: collective kinds invariant "
            "across 2/4/8 shards and every payload in the expected "
            "pose-system set -- deterministic on the virtual mesh, unlike "
            "wall time on one core"
        ),
    }


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--mode", choices=["weak", "strong"], default="weak")
    parser.add_argument("--poses", type=int, default=None,
                        help="base (per-device in weak mode) pose count")
    parser.add_argument("--points", type=int, default=None,
                        help="base (per-device in weak mode) landmark count")
    parser.add_argument("--window", type=int, default=6)
    parser.add_argument("--iters", type=int, default=3)
    parser.add_argument("--device-counts", type=int, nargs="*", default=None)
    parser.add_argument(
        "--impl", choices=["cg", "pm"], default="pm",
        help="'cg' = observation-table shard_map engine; 'pm' = point-major "
        "Pallas engine (interpret mode on CPU)",
    )
    args = parser.parse_args()

    import jax
    import numpy as np

    from bundle_adjustment_solver_tpu.models.problem import (
        finalized_from_arrays,
    )
    from bundle_adjustment_solver_tpu.options import (
        ConvergenceHandle,
        IterationHandle,
        Options,
        SolverType,
    )
    from bundle_adjustment_solver_tpu.parallel.sharded_ba import (
        _solve_sharded_jax,
        shard_problem,
    )
    from bundle_adjustment_solver_tpu.parallel.sharded_pm import (
        comm_volume_model,
        solve_sharded_pm,
    )
    from bundle_adjustment_solver_tpu.utils.synthetic import (
        corridor_ba_problem,
    )

    base_poses = args.poses or (100 if args.mode == "weak" else 300)
    base_points = args.points or (6_000 if args.mode == "weak" else 12_000)

    options = Options(
        solver_type=SolverType.LEVENBERG_MARQUARDT,
        convergence_handle=ConvergenceHandle(0.0, 0.0),
        iteration_handle=IterationHandle(args.iters),
        reduced_system="cg",
        cg_max_iterations=25,
        cg_tolerance=1e-6,
    )

    counts = args.device_counts or [1, 2, 4, len(jax.devices())]
    counts = sorted({c for c in counts if c <= len(jax.devices())})

    def build(n_poses, n_points):
        prob = corridor_ba_problem(
            num_poses=n_poses, num_points=n_points, window=args.window,
            seed=7,
        )
        fixed_pose = np.zeros(n_poses, dtype=bool)
        fixed_pose[prob.fixed_pose_ids] = True
        return finalized_from_arrays(
            prob.cameras, prob.poses_initial, prob.points_initial,
            prob.obs_camera, prob.obs_pose, prob.obs_point, prob.obs_pixel,
            fixed_pose_mask=fixed_pose,
        )

    results = []
    for n_dev in counts:
        if args.mode == "weak":
            # Constant landmarks + observations PER DEVICE; the pose count
            # grows too so the trajectory stays covisibility-bounded.
            problem, shape = build(base_poses * n_dev, base_points * n_dev)
        else:
            problem, shape = build(base_poses, base_points)

        if args.impl == "pm":
            def run_pm():
                state, _ = solve_sharded_pm(
                    problem, shape, options, num_shards=n_dev
                )
                return state
            state = run_pm()  # compile + warm (layout rebuilt per count)
            t0 = time.perf_counter()
            state = run_pm()
            dt = time.perf_counter() - t0
        else:
            sharded, sshape = shard_problem(problem, shape, n_dev)
            state = jax.block_until_ready(
                _solve_sharded_jax(sharded, sshape, options)
            )  # compile + warm
            t0 = time.perf_counter()
            state = jax.block_until_ready(
                _solve_sharded_jax(sharded, sshape, options)
            )
            dt = time.perf_counter() - t0
        results.append(
            (n_dev, dt, float(state.final_cost), shape.num_observations)
        )

    import os

    base_n, base_t, _, base_obs = results[0]
    # On this rig the "mesh" is virtual devices multiplexed onto
    # os.cpu_count() physical cores (often ONE): shards execute
    # (near-)sequentially, so the ideal wall time for n devices is
    # n/cores x t1, NOT t1. Normalize against the sequential ideal so the
    # numbers measure ALGORITHMIC overhead (resharding, collectives,
    # padding) instead of refuting parallelism the rig cannot express.
    cores = os.cpu_count() or 1
    sequential = jax.default_backend() == "cpu" and cores < max(counts)
    print(f"mode={args.mode} impl={args.impl} "
          f"(sequential-ideal normalization: {sequential}, {cores} cores)")
    print(f"{'devices':>8} {'obs':>10} {'time_s':>10} {'overhead_eff':>13}")
    rows = []
    for n_dev, dt, cost, n_obs in results:
        if args.mode == "weak":
            work_ratio = n_obs / base_obs  # total work vs 1-device run
        else:
            work_ratio = 1.0
        ideal = base_t * (work_ratio if sequential else work_ratio / n_dev)
        eff = ideal / dt
        print(f"{n_dev:>8} {n_obs:>10} {dt:>10.3f} {eff:>12.1%}")
        # The artifact carries PARITY fields only (VERDICT r4 weak #6):
        # wall times of virtual devices multiplexed onto one core are
        # pure noise (measured overhead_efficiency up to 1.48 across
        # rounds) -- the HLO invariance gate is the real sharding
        # regression check; walls stay on stdout for the human.
        rows.append(
            {"devices": n_dev, "observations": n_obs, "final_cost": cost}
        )

    invariance = None
    if jax.default_backend() == "cpu" and len(jax.devices()) >= 8:
        print("\nHLO invariance gate (collective structure at 2/4/8 shards)…")
        invariance = hlo_invariance_check()
        print("  ok:", invariance["collective_kinds_per_program"])

    prof, split_source = _flagship_measured()
    counts_proj = [1, 2, 4, 8, 16, 32]
    projection = ici_projection(10_000, prof, counts_proj, pose_sharded=True)
    projection_rep = ici_projection(
        10_000, prof, counts_proj, pose_sharded=False
    )

    # DCN tier (VERDICT r4 #4): cross-slice configs, with the measured
    # Gloo per-collective latency as the worst-case software anchor when
    # the 2-process rig has been run (benchmarks/multihost_gloo.json,
    # written by tests/test_multihost.py).
    dcn_configs = [(1, 8), (2, 8), (2, 16), (4, 16), (2, 32)]
    dcn = dcn_projection(10_000, prof, dcn_configs)
    gloo_path = pathlib.Path(__file__).resolve().parent / \
        "multihost_gloo.json"
    dcn_gloo = None
    if gloo_path.exists():
        gloo = json.loads(gloo_path.read_text())
        scalar_ms = next(
            r["median_ms"] for r in gloo["rows"] if r["payload"] == "scalar"
        )
        dcn_gloo = dcn_projection(
            10_000, prof, [(2, 8), (2, 16)],
            latency_per_collective=scalar_ms * 1e-3,
            label="MEASURED Gloo median scalar psum "
                  "(benchmarks/multihost_gloo.json; loopback 2-process "
                  "rig, dispatch-dominated -- worst case)",
        )
    print("\nICI projection (flagship 10k/1M, measured phase split):")
    print(f"{'devices':>8} {'lm_iter_ms':>11} {'comm_ms':>8}"
          f" {'pose-sharded':>13} {'replicated':>11}")
    for r, rr in zip(projection, projection_rep):
        print(f"{r['devices']:>8} {r['lm_iter_ms']:>11} {r['comm_ms']:>8}"
              f" {r['efficiency']:>12.1%} {rr['efficiency']:>10.1%}")

    print("\nDCN projection (cross-slice, hierarchical):")
    print(f"{'slices':>7} {'chips/slice':>12} {'ici_ms':>8} {'dcn_ms':>8}"
          f" {'efficiency':>11}")
    for r in dcn["rows"]:
        print(f"{r['slices']:>7} {r['chips_per_slice']:>12}"
              f" {r['ici_ms']:>8} {r['dcn_ms']:>8}"
              f" {r['efficiency']:>10.1%}")
    if dcn_gloo is not None:
        for r in dcn_gloo["rows"]:
            print(f"  gloo-anchor S={r['slices']} d={r['chips_per_slice']}: "
                  f"dcn_ms={r['dcn_ms']} eff={r['efficiency']:.1%}")

    artifact = {
        # Headline evidence first: the ICI projection is computed from
        # measured single-chip inputs (phase split + exact psum bytes);
        # the virtual-mesh run below it is a CORRECTNESS/overhead check
        # only -- this rig multiplexes virtual devices onto
        # os.cpu_count() cores, so its wall times cannot express real
        # parallelism in either direction.
        "north_star": ">=70% efficiency on 2+ hosts (BASELINE.md)",
        "ici_projection_flagship": {
            "assumptions": {
                "ici_ring_bw_bytes_per_s": ICI_RING_BW,
                "latency_per_psum_s": ICI_LATENCY_PER_PSUM,
                "measured_phase_split_ms": prof,
                "source": split_source,
            },
            "engine": "pose_sharded (default, parallel/sharded_pm.py)",
            "rows": projection,
            "replicated_pose_side_engine_rows": projection_rep,
        },
        "dcn_projection_flagship": {
            "assumptions": {
                "chips_per_host": CHIPS_PER_HOST,
                "dcn_bw_per_host_bytes_per_s": DCN_BW_PER_HOST,
                "dcn_latency_per_collective_s": DCN_LATENCY_PER_COLLECTIVE,
                "decomposition": (
                    "hierarchical: intra-slice phases ride ICI (single-"
                    "tier model at D = slices*chips), cross-slice phase "
                    "ships 2*B*(S-1)/S bytes per slice through the "
                    "slice's aggregate NIC bandwidth + 1 DCN latency "
                    "per collective"
                ),
            },
            "modeled": dcn,
            "gloo_anchor": dcn_gloo,
            "north_star_note": (
                ">=70% on 2+ hosts holds WITHIN a slice via ICI (hosts "
                "share the slice fabric: 16 chips = 2 hosts at 81.5%); "
                "the DCN rows quantify the cross-SLICE case, where the "
                "per-collective latency -- not bandwidth -- is the "
                "binding constraint for this problem's small psums"
            ),
        },
        "comm_model_per_lm_iteration": comm_volume_model(
            10_000, prof["cg_per_lm"], pose_sharded=True, num_shards=8
        ),
        "hlo_invariance_gate": invariance,
        "virtual_mesh_check": {
            "mode": args.mode,
            "impl": args.impl,
            "backend": jax.default_backend(),
            "physical_cores": cores,
            "sequential_ideal_normalization": sequential,
            "interpretation": (
                "CORRECTNESS check on virtual CPU devices: final_cost "
                "parity across shard counts. Wall-time fields were "
                "dropped (r4 weak #6: one shared core makes them pure "
                "noise); the hlo_invariance_gate above is the "
                "deterministic sharding regression check"
            ),
            "problem": {
                "base_poses": base_poses, "base_points": base_points,
                "window": args.window, "lm_iterations": args.iters,
                "per_device_constant": args.mode == "weak",
            },
            "rows": rows,
        },
    }
    out = pathlib.Path(__file__).resolve().parents[1] / "SCALING.json"
    out.write_text(json.dumps(artifact, indent=1))
    print(json.dumps({"scaling": rows}))
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
