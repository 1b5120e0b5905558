#!/usr/bin/env python
"""Microbenchmark for the point-major Schur-CG matvec kernel (real TPU).

Times `matvec_corr_pm` in isolation with an in-jit fori_loop (data
dependence prevents folding; one scalar fetch at the end -- see CLAUDE.md
timing notes), at the flagship 10k-pose / 1M-landmark shapes by default.

    python benchmarks/matvec_bench.py [--poses 10000 --points 1000000]
        [--u-dtype float32|bfloat16] [--reps 50]
"""

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--poses", type=int, default=10_000)
    ap.add_argument("--points", type=int, default=1_000_000)
    ap.add_argument("--window", type=int, default=6)
    ap.add_argument("--u-dtype", default="float32")
    ap.add_argument("--reps", type=int, default=50)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from bundle_adjustment_solver_tpu.models.problem import (
        finalized_from_arrays,
    )
    from bundle_adjustment_solver_tpu.ops.pallas import full_ba_pm as K
    from bundle_adjustment_solver_tpu.solvers import full_ba_pm
    from bundle_adjustment_solver_tpu.utils.synthetic import (
        corridor_ba_problem,
    )

    prob = corridor_ba_problem(
        num_poses=args.poses, num_points=args.points, window=args.window,
        seed=123,
    )
    fixed = np.zeros(args.poses, bool)
    fixed[prob.fixed_pose_ids] = True
    problem, shape, host = finalized_from_arrays(
        prob.cameras, prob.poses_initial, prob.points_initial,
        prob.obs_camera, prob.obs_pose, prob.obs_point, prob.obs_pixel,
        fixed_pose_mask=fixed, return_host=True,
    )
    pm, pshape = full_ba_pm.pm_from_finalized(problem, shape, host=host)
    dev = jax.devices()[0]
    pm = jax.device_put(pm, dev)
    problem = jax.device_put(problem, dev)
    print("shape:", pshape, flush=True)

    _, _, Cb, U = K.assemble_pm(
        pm, pshape, problem.R_cw, problem.t_cw, pm.X, problem.rig,
        jnp.float32(1.0), jnp.float32(0.01), u_dtype=args.u_dtype,
    )
    n_opt = pshape.num_opt_poses
    x0 = jnp.ones((n_opt, 6), jnp.float32) * 1e-3

    import functools

    # pm/Cb/U must be jit ARGUMENTS: closure-captured device arrays are
    # serialized into the HLO as constants, which the tunnel's remote
    # compile service rejects at these sizes (HTTP 413).
    @functools.partial(jax.jit, static_argnames=("reps",))
    def loop(pm, Cb, U, x, reps):
        def body(_, x):
            corr, _t = K.matvec_corr_pm(pm, pshape, Cb, U, x)
            return x + corr * 1e-30
        return jax.lax.fori_loop(0, reps, body, x)

    float(np.asarray(loop(pm, Cb, U, x0, 2)[0, 0]))  # compile + warm
    t0 = time.perf_counter()
    float(np.asarray(loop(pm, Cb, U, x0, args.reps)[0, 0]))
    t1 = time.perf_counter()
    t0b = time.perf_counter()
    float(np.asarray(loop(pm, Cb, U, x0, 2)[0, 0]))
    t1b = time.perf_counter()
    per_call = ((t1 - t0) - (t1b - t0b)) / (args.reps - 2) * 1e3
    n_obs = shape.num_observations
    print(
        f"matvec ({args.u_dtype} U): {per_call:.3f} ms/call  "
        f"({n_obs / per_call * 1e3 / 1e9:.2f}G obs/s equivalent)"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
