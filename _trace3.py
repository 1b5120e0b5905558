import numpy as np
import jax
from bundle_adjustment_solver_tpu.models.problem import finalized_from_arrays
from bundle_adjustment_solver_tpu.solvers import full_ba_pm
from bundle_adjustment_solver_tpu.options import *
from bundle_adjustment_solver_tpu.utils.synthetic import corridor_ba_problem
prob = corridor_ba_problem(num_poses=2000, num_points=200_000, window=6, seed=123)
fixed = np.zeros(2000, bool); fixed[prob.fixed_pose_ids] = True
problem, shape, host = finalized_from_arrays(prob.cameras, prob.poses_initial, prob.points_initial,
    prob.obs_camera, prob.obs_pose, prob.obs_point, prob.obs_pixel, fixed_pose_mask=fixed, return_host=True)
pm, pshape = full_ba_pm.pm_from_finalized(problem, shape, host=host)
dev = jax.devices()[0]
pm = jax.device_put(pm, dev); problem = jax.device_put(problem, dev)
o = Options(solver_type=SolverType.LEVENBERG_MARQUARDT,
    convergence_handle=ConvergenceHandle(0.0, 0.0), iteration_handle=IterationHandle(10),
    cg_max_iterations=25, cg_tolerance=0.0)
def run():
    out = full_ba_pm._solve_pm_jax(pm, pshape, problem.rig, problem.R_cw, problem.t_cw,
        problem.opt_pose_idx, o, interpret=False)
    return float(out[7])
run(); run()
with jax.profiler.trace("/tmp/pmtrace3"):
    run()
print("done")
