#!/usr/bin/env python
"""Scaling-efficiency harness for the distributed full-BA solver.

BASELINE.md's north-star: >= 70% scaling efficiency on 2+ hosts for the
10k-pose / 1M-landmark problem. Only one real chip is reachable from this
environment, so by default this measures *algorithmic* scaling on virtual CPU
devices (communication volumes are real; speeds are not) and prints the
per-device-count timings + parallel efficiency. On a real pod slice, run the
same script with JAX_PLATFORMS unset and real devices.

Usage:
    JAX_PLATFORMS=cpu PYTHONPATH= \
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python benchmarks/scaling.py --poses 500 --points 20000 --iters 5
"""

import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--poses", type=int, default=500)
    parser.add_argument("--points", type=int, default=20_000)
    parser.add_argument("--window", type=int, default=6)
    parser.add_argument("--iters", type=int, default=5)
    parser.add_argument("--device-counts", type=int, nargs="*", default=None)
    parser.add_argument(
        "--impl", choices=["cg", "pm"], default="cg",
        help="'cg' = observation-table shard_map engine; 'pm' = point-major "
        "Pallas engine (use on real TPU meshes -- interpret mode on CPU)",
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
        solve_sharded_pm,
    )
    from bundle_adjustment_solver_tpu.utils.synthetic import (
        corridor_ba_problem,
    )

    prob = corridor_ba_problem(
        num_poses=args.poses, num_points=args.points, window=args.window,
        seed=7,
    )
    fixed_pose = np.zeros(args.poses, dtype=bool)
    fixed_pose[prob.fixed_pose_ids] = True
    problem, shape = finalized_from_arrays(
        prob.cameras,
        prob.poses_initial,
        prob.points_initial,
        prob.obs_camera,
        prob.obs_pose,
        prob.obs_point,
        prob.obs_pixel,
        fixed_pose_mask=fixed_pose,
    )
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
    results = []
    for n_dev in counts:
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
        results.append((n_dev, dt, float(state.final_cost)))

    base_n, base_t, _ = results[0]
    print(f"{'devices':>8} {'time_s':>10} {'speedup':>9} {'efficiency':>11}")
    rows = []
    for n_dev, dt, cost in results:
        speedup = base_t / dt
        eff = speedup / (n_dev / base_n)
        print(f"{n_dev:>8} {dt:>10.3f} {speedup:>9.2f} {eff:>10.1%}")
        rows.append(
            {"devices": n_dev, "time_s": dt, "speedup": speedup,
             "efficiency": eff, "final_cost": cost}
        )
    from bundle_adjustment_solver_tpu.parallel.sharded_pm import (
        comm_volume_model,
    )

    artifact = {
        "impl": args.impl,
        "backend": jax.default_backend(),
        "problem": {
            "poses": args.poses, "points": args.points,
            "observations": shape.num_observations, "window": args.window,
            "lm_iterations": args.iters,
        },
        # Virtual-CPU runs measure ALGORITHMIC scaling only (honest flag);
        # the psum byte counts below are exact either way.
        "algorithmic_only": jax.default_backend() == "cpu",
        "comm_model_per_lm_iteration": comm_volume_model(
            shape.num_opt_poses, options.cg_max_iterations
        ),
        "scaling": rows,
    }
    out = pathlib.Path(__file__).resolve().parents[1] / "SCALING.json"
    out.write_text(json.dumps(artifact, indent=1))
    print(json.dumps({"scaling": rows}))
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
