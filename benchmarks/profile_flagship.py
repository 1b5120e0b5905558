#!/usr/bin/env python
"""Profile the flagship full-BA LM iteration and decompose device time.

VERDICT r2 weak #5 / task 8: the round-2 PERF.md decomposition left ~5 ms
of per-LM-iteration "XLA glue" unattributed. This traces a fixed number of
flagship LM iterations (adaptive-CG config = the bench headline) with the
JAX profiler and aggregates the xplane per-op totals so the glue is broken
down by op family (pallas custom-calls vs second-level scatter vs sym6
algebra vs CG vector ops vs SE(3) step).

Usage (real chip):  python benchmarks/profile_flagship.py [lm_iters]
Then read the printed table; raw trace stays under /tmp/flagship_trace.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


from bundle_adjustment_solver_tpu.options import (
    ConvergenceHandle,
    IterationHandle,
    Options,
    SolverType,
)
from bundle_adjustment_solver_tpu.solvers import full_ba_pm
from bundle_adjustment_solver_tpu.utils.synthetic import corridor_problem_on_device

NUM_POSES = int(os.environ.get("BENCH_POSES", 10_000))
NUM_POINTS = int(os.environ.get("BENCH_POINTS", 1_000_000))
LM_ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 20
CG_FORCING = os.environ.get("BENCH_CG", "ew")


def main():
    print("devices:", jax.devices())
    problem, shape, _host, pm, pshape = corridor_problem_on_device(
        NUM_POSES, NUM_POINTS, window=6, seed=123
    )

    opts = Options(
        solver_type=SolverType.LEVENBERG_MARQUARDT,
        convergence_handle=ConvergenceHandle(0.0, 0.0),
        iteration_handle=IterationHandle(LM_ITERS),
        reduced_system="cg",
        cg_max_iterations=25,
        cg_tolerance=0.0,
        cg_forcing=CG_FORCING,
        # BENCH_FUSED_CG=0 profiles the unfused PCG path for A/B device-
        # time comparison against the fused cg_step kernel (the default).
        cg_fused_step=os.environ.get("BENCH_FUSED_CG", "1") != "0",
    )

    def run():
        out = full_ba_pm._solve_pm_jax(
            pm, pshape, problem.rig, problem.R_cw, problem.t_cw,
            problem.opt_pose_idx, opts, interpret=False,
        )
        float(np.asarray(out[7]))  # one scalar fetch = sync
        return out

    run()  # compile + warm
    t0 = time.perf_counter()
    out = run()
    wall = time.perf_counter() - t0
    print(f"wall: {wall*1e3:.1f} ms for {LM_ITERS} LM iters "
          f"({wall*1e3/LM_ITERS:.2f} ms/iter, forcing={CG_FORCING})")

    # Persist the measured phase-split inputs of the SCALING.json ICI
    # projection (benchmarks/scaling.py reads this file when present, so a
    # bench/profile recapture refreshes the projection mechanically).
    from bundle_adjustment_solver_tpu.summary import INFO_CG_ITERS

    info = np.asarray(out[5])[:LM_ITERS]
    cg_iters = info[:, INFO_CG_ITERS].astype(int)
    here = os.path.dirname(os.path.abspath(__file__))
    fused = os.environ.get("BENCH_FUSED_CG", "1") != "0"
    artifact = {
        "num_poses": NUM_POSES,
        "num_points": NUM_POINTS,
        "lm_iters": LM_ITERS,
        "cg_forcing": CG_FORCING,
        "cg_fused_step": fused,
        "lm_iter_ms": round(wall * 1e3 / LM_ITERS, 3),
        "cg_per_lm": round(float(cg_iters.sum()) / LM_ITERS, 3),
    }

    trace_dir = "/tmp/flagship_trace"
    with jax.profiler.trace(trace_dir):
        run()

    # MEASURED landmark-sharded vs replicated pose-side phase split
    # (VERDICT r3 weak #1: the ICI projection must not run on an assumed
    # replicated_ms). Landmark-proportional dims start at nblocks * window
    # (the second-level segment-sum rows); every pose tensor is far below.
    from bundle_adjustment_solver_tpu.utils.profiling import phase_split_ms

    split = phase_split_ms(
        trace_dir, LM_ITERS, lm_dim_floor=pshape.num_blocks * pshape.window,
        # Full-pose-table ops (candidate write, accept select) stay
        # per-device even in the pose-sharded distributed engine.
        full_pose_dims=(pshape.num_poses, pshape.num_poses + pshape.window),
    )
    if split is not None:
        artifact.update(
            {k: round(v, 3) for k, v in split.items()
             if not isinstance(v, dict)}
        )
        artifact["top_replicated_ops_ms"] = split["top_replicated"]
        print("measured phase split (per LM iteration):",
              json.dumps(split, indent=1))

    # Only the DEFAULT configuration feeds the projection: an A/B run of
    # the unfused path (BENCH_FUSED_CG=0) must not overwrite it.
    if fused and CG_FORCING == "ew" and NUM_POSES == 10_000:
        with open(os.path.join(here, "flagship_profile.json"), "w") as f:
            json.dump(artifact, f, indent=1)
        print("wrote", os.path.join(here, "flagship_profile.json"))
    print(json.dumps(artifact))

    root = os.path.dirname(here)
    subprocess.run(
        [sys.executable, os.path.join(root, "tools", "parse_xplane.py"),
         trace_dir, "40"],
        check=True,
    )


if __name__ == "__main__":
    main()
