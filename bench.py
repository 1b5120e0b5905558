#!/usr/bin/env python
"""Benchmark: full stereo BA throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Workload (BASELINE.json primary config, scaled to one chip): corridor stereo
BA -- 2,000 poses / 200,000 landmarks / 2.4M observations -- solved with the
point-major Pallas Schur-CG LM engine (BENCH_IMPL=cg selects the portable
observation-table path instead), measuring LM iterations/s and
observations x LM-iterations per second per chip.

Baseline: the reference (ChanghyeonKim93/bundle_adjustment_solver) publishes
no numbers (BASELINE.md); its serial C++ observation loop costs ~1 us per
observation per LM iteration on desktop x86 (hand-expanded Eigen arithmetic,
full cpp:716-831, plus O(N*M) zeroing per iteration, cpp:343-379 -- and its
dense storage cannot represent this problem size at all). We use
1e6 obs-iterations/s as the reference-throughput estimate, so
vs_baseline = value / 1e6.
"""

import json
import os
import sys
import time

import numpy as np

# Benchmark runs on the real chip: do NOT force CPU here.
import jax

from bundle_adjustment_solver_tpu.models.problem import finalized_from_arrays
from bundle_adjustment_solver_tpu.options import (
    ConvergenceHandle,
    IterationHandle,
    Options,
    SolverType,
)
from bundle_adjustment_solver_tpu.solvers import full_ba
from bundle_adjustment_solver_tpu.utils.synthetic import corridor_ba_problem

NUM_POSES = int(os.environ.get("BENCH_POSES", 2000))
NUM_POINTS = int(os.environ.get("BENCH_POINTS", 200_000))
WINDOW = int(os.environ.get("BENCH_WINDOW", 6))
TIMED_ITERS = int(os.environ.get("BENCH_ITERS", 50))
IMPL = os.environ.get("BENCH_IMPL", "pm")  # 'pm' (pallas) | 'cg' (obs table)


def build():
    prob = corridor_ba_problem(
        num_poses=NUM_POSES, num_points=NUM_POINTS, window=WINDOW, seed=123
    )
    fixed_pose = np.zeros(NUM_POSES, dtype=bool)
    fixed_pose[prob.fixed_pose_ids] = True
    problem, shape, host = finalized_from_arrays(
        prob.cameras,
        prob.poses_initial,
        prob.points_initial,
        prob.obs_camera,
        prob.obs_pose,
        prob.obs_point,
        prob.obs_pixel,
        fixed_pose_mask=fixed_pose,
        return_host=True,
    )
    return prob, problem, shape, host


def options(max_iter):
    # Thresholds at 0 force exactly max_iter LM iterations and exactly 25 CG
    # iterations per LM iteration (no early exit): a deterministic workload,
    # comparable across runs regardless of convergence state.
    return Options(
        solver_type=SolverType.LEVENBERG_MARQUARDT,
        convergence_handle=ConvergenceHandle(0.0, 0.0),
        iteration_handle=IterationHandle(max_iter),
        reduced_system="cg",
        cg_max_iterations=25,
        cg_tolerance=0.0,
    )


def main():
    dev = jax.devices()[0]
    prob, problem, shape, host = build()
    n_obs = shape.num_observations

    # Move the problem to device once (production solvers keep state
    # resident; the tunnel makes per-call H2D expensive).
    problem = jax.device_put(problem, dev)

    if IMPL == "pm":
        from bundle_adjustment_solver_tpu.solvers import full_ba_pm

        pm, pshape = full_ba_pm.pm_from_finalized(problem, shape, host=host)
        pm = jax.device_put(pm, dev)

        def run(n):
            out = full_ba_pm._solve_pm_jax(
                pm, pshape, problem.rig, problem.R_cw, problem.t_cw,
                problem.opt_pose_idx, options(n), interpret=False,
            )
            # Force full execution (block_until_ready is unreliable over the
            # device tunnel; a scalar fetch is not).
            return out, float(out[7])

        run(TIMED_ITERS)  # compile + warm-up
        t0 = time.perf_counter()
        out, _ = run(TIMED_ITERS)
        elapsed = time.perf_counter() - t0
        rmse = float(out[8])
    else:

        def run(n):
            state = full_ba._solve_jax(problem, shape, options(n), "cg")
            return state, float(state.final_cost)

        run(TIMED_ITERS)
        t0 = time.perf_counter()
        state, _ = run(TIMED_ITERS)
        elapsed = time.perf_counter() - t0
        rmse = float(state.final_rmse_px)

    iters_per_s = TIMED_ITERS / elapsed
    obs_iters_per_s = n_obs * iters_per_s

    result = {
        "metric": (
            "full_BA_observations_x_LM-iterations_per_second_per_chip "
            f"({NUM_POSES} poses, {NUM_POINTS} landmarks, {n_obs} obs, "
            f"{IMPL} schur-CG LM, final_rmse_px={rmse:.4f}, "
            f"lm_iters_per_s={iters_per_s:.3f})"
        ),
        "value": round(obs_iters_per_s, 1),
        "unit": "obs*iter/s",
        "vs_baseline": round(obs_iters_per_s / 1e6, 3),
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
