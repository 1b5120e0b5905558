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

import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from bundle_adjustment_solver_tpu.models.problem import finalized_from_arrays
from bundle_adjustment_solver_tpu.options import (
    ConvergenceHandle,
    IterationHandle,
    Options,
    SolverType,
)
from bundle_adjustment_solver_tpu.solvers import full_ba_pm
from bundle_adjustment_solver_tpu.utils.synthetic import corridor_ba_problem

NUM_POSES = int(os.environ.get("BENCH_POSES", 10_000))
NUM_POINTS = int(os.environ.get("BENCH_POINTS", 1_000_000))
LM_ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 20
CG_FORCING = os.environ.get("BENCH_CG", "ew")


def main():
    print("devices:", jax.devices())
    prob = corridor_ba_problem(
        num_poses=NUM_POSES, num_points=NUM_POINTS, window=6, seed=123
    )
    fixed_pose = np.zeros(NUM_POSES, dtype=bool)
    fixed_pose[prob.fixed_pose_ids] = True
    problem, shape, host = finalized_from_arrays(
        prob.cameras, prob.poses_initial, prob.points_initial,
        prob.obs_camera, prob.obs_pose, prob.obs_point, prob.obs_pixel,
        fixed_pose_mask=fixed_pose, return_host=True,
    )
    dev = jax.devices()[0]
    problem = jax.device_put(problem, dev)
    pm, pshape = full_ba_pm.pm_from_finalized(problem, shape, host=host)
    pm = jax.device_put(pm, dev)

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
        return float(np.asarray(out[7]))

    run()  # compile + warm
    t0 = time.perf_counter()
    run()
    wall = time.perf_counter() - t0
    print(f"wall: {wall*1e3:.1f} ms for {LM_ITERS} LM iters "
          f"({wall*1e3/LM_ITERS:.2f} ms/iter, forcing={CG_FORCING})")

    trace_dir = "/tmp/flagship_trace"
    with jax.profiler.trace(trace_dir):
        run()
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    subprocess.run(
        [sys.executable, os.path.join(here, "tools", "parse_xplane.py"),
         trace_dir, "40"],
        check=True,
    )


if __name__ == "__main__":
    main()
