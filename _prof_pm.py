import time
import numpy as np
import jax, jax.numpy as jnp
from bundle_adjustment_solver_tpu.models.problem import finalized_from_arrays
from bundle_adjustment_solver_tpu.solvers import full_ba_pm
from bundle_adjustment_solver_tpu.ops.pallas import full_ba_pm as K
from bundle_adjustment_solver_tpu.utils.synthetic import corridor_ba_problem

NPOSE, NPT, W = 2000, 200_000, 6
prob = corridor_ba_problem(num_poses=NPOSE, num_points=NPT, window=W, seed=123)
fixed = np.zeros(NPOSE, bool); fixed[prob.fixed_pose_ids] = True
problem, shape, host = finalized_from_arrays(prob.cameras, prob.poses_initial, prob.points_initial,
    prob.obs_camera, prob.obs_pose, prob.obs_point, prob.obs_pixel, fixed_pose_mask=fixed, return_host=True)
pm, pshape = full_ba_pm.pm_from_finalized(problem, shape, host=host)
dev = jax.devices()[0]
pm = jax.device_put(pm, dev); problem = jax.device_put(problem, dev)
_ = float(jnp.sum(pm.X))
huber = 1.0 * shape.scale
REPS = 10

def bench(name, fn, init):
    @jax.jit
    def run(pm, problem):
        def body(i, acc):
            out = fn(pm, problem, acc, i)
            return acc + out * 1e-20
        return jax.lax.fori_loop(0, REPS, body, init)
    _ = float(run(pm, problem))
    t0 = time.perf_counter()
    _ = float(run(pm, problem))
    t = (time.perf_counter()-t0)*1e3
    print(f"{name}: {(t-45)/REPS:.1f} ms")

def f_assemble(pm, problem, acc, i):
    flat, Cb, U = K.assemble_pm_partials(pm, pshape, problem.R_cw, problem.t_cw + acc*1e-30,
        pm.X, problem.rig, jnp.float32(1.0), huber)
    return flat[0,0]
bench("assemble_pm (kernel + 2nd level)", f_assemble, jnp.float32(0))

def f_cost(pm, problem, acc, i):
    s_norm, s_wsq, _, _ = K.cost_pm(pm, pshape, problem.R_cw, problem.t_cw + acc*1e-30, pm.X, problem.rig, huber)
    return s_norm
bench("cost_pm", f_cost, jnp.float32(0))

# precompute system for matvec/rhs
flat, Cb, U = K.assemble_pm_partials(pm, pshape, problem.R_cw, problem.t_cw, pm.X, problem.rig, jnp.float32(1.0), huber)
A, a = K.finish_pose_system(flat, jnp.float32(1.0))
A, a, Cb, U = jax.device_put((A, a, Cb, U), dev)
_ = float(jnp.sum(a))

def f_matvec(pm, problem, acc, i):
    x = jnp.full((pshape.num_opt_poses, 6), 1.0 + acc*1e-30)
    corr, t = K.matvec_corr_pm(pm, pshape, Cb, U, x)
    return corr[0,0]
bench("matvec_corr_pm", f_matvec, jnp.float32(0))

def f_rhs(pm, problem, acc, i):
    return K.rhs_corr_pm(pm, pshape, Cb + acc*1e-30, U)[0,0]
bench("rhs_corr_pm", f_rhs, jnp.float32(0))

from bundle_adjustment_solver_tpu.ops.hessian import inverse_6x6
from bundle_adjustment_solver_tpu.ops.lie import compose, se3_exp
from bundle_adjustment_solver_tpu.solvers.full_ba_pm import _apply_cinv, _c_times

def f_finish(pm, problem, acc, i):
    A2, a2 = K.finish_pose_system(flat + acc*1e-30, jnp.float32(1.0))
    return A2[0,0,0]
bench("finish_pose_system", f_finish, jnp.float32(0))

def f_inv6(pm, problem, acc, i):
    return inverse_6x6(A + acc*1e-30)[0,0,0]
bench("inverse_6x6 (1998)", f_inv6, jnp.float32(0))

def f_step(pm, problem, acc, i):
    x = jnp.full((pshape.num_opt_poses, 6), 1e-8) + acc*1e-30
    dR, dt = se3_exp(x)
    R_opt = problem.R_cw[problem.opt_pose_idx]
    t_opt = problem.t_cw[problem.opt_pose_idx]
    Rn, tn = compose(dR, dt, R_opt, t_opt)
    Rc = problem.R_cw.at[problem.opt_pose_idx].set(Rn)
    return Rc[0,0,0]
bench("se3_exp+compose+scatter (1998 poses)", f_step, jnp.float32(0))

def f_y(pm, problem, acc, i):
    t = jnp.zeros((4, pshape.padded_points)) + acc*1e-30
    y = _apply_cinv(Cb, t)
    Xc = pm.X.at[:3].add(y * pm.X[3:4])
    sp = jnp.sum(jnp.sqrt(jnp.maximum(jnp.sum(y*y, axis=0), 0.0)) * pm.X[3])
    return Xc[0,0] + sp
bench("backsub y + X update + step norm", f_y, jnp.float32(0))

def f_posetbl(pm, problem, acc, i):
    tbl = K._pose_table(problem.R_cw, problem.t_cw + acc*1e-30, pshape.window)
    return tbl[0,0]
bench("pose_table pack", f_posetbl, jnp.float32(0))
