import time
import numpy as np
import jax, jax.numpy as jnp
from bundle_adjustment_solver_tpu.models.problem import finalized_from_arrays
from bundle_adjustment_solver_tpu.solvers import full_ba_pm
from bundle_adjustment_solver_tpu.ops.pallas import full_ba_pm as K
from bundle_adjustment_solver_tpu.ops.hessian import inverse_6x6
from bundle_adjustment_solver_tpu.ops.lie import compose, se3_exp
from bundle_adjustment_solver_tpu.solvers.full_ba_pm import _apply_cinv
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
N_IT = 10

def timeloop(name, body_fn):
    @jax.jit
    def run(pm, problem):
        def body(c):
            R_cw, t_cw, X, lam, it = c
            R_cw, t_cw, X, lam = body_fn(R_cw, t_cw, X, lam)
            return (R_cw, t_cw, X, lam, it+1)
        def cond(c): return c[4] < N_IT
        c = jax.lax.while_loop(cond, body, (problem.R_cw, problem.t_cw, pm.X, jnp.float32(1.0), jnp.int32(0)))
        return c[1][0,0] + c[2][0,0]
    _ = float(run(pm, problem))
    t0 = time.perf_counter()
    _ = float(run(pm, problem))
    t = (time.perf_counter()-t0)*1e3
    print(f"{name}: {(t-45)/N_IT:.1f} ms/iter")

def v1(R_cw, t_cw, X, lam):
    flat, Cb, U = K.assemble_pm_partials(pm, pshape, R_cw, t_cw, X, pm and problem.rig, lam, huber)
    return R_cw, t_cw + flat[0,0]*1e-30, X, lam
timeloop("v1: assemble only", v1)

def v2(R_cw, t_cw, X, lam):
    flat, Cb, U = K.assemble_pm_partials(pm, pshape, R_cw, t_cw, X, problem.rig, lam, huber)
    A, a = K.finish_pose_system(flat, lam)
    rhs = a - K.rhs_corr_pm(pm, pshape, Cb, U)
    corr, t = K.matvec_corr_pm(pm, pshape, Cb, U, rhs)
    return R_cw, t_cw + corr[0,0]*1e-30, X, lam
timeloop("v2: + finish/rhs/1 matvec", v2)

def v3(R_cw, t_cw, X, lam):
    flat, Cb, U = K.assemble_pm_partials(pm, pshape, R_cw, t_cw, X, problem.rig, lam, huber)
    A, a = K.finish_pose_system(flat, lam)
    rhs = a - K.rhs_corr_pm(pm, pshape, Cb, U)
    corr, t = K.matvec_corr_pm(pm, pshape, Cb, U, rhs)
    x = (rhs - corr) * 1e-9
    y = _apply_cinv(Cb, t)
    dR, dt = se3_exp(x)
    R_opt = R_cw[problem.opt_pose_idx]; t_opt = t_cw[problem.opt_pose_idx]
    Rn, tn = compose(dR, dt, R_opt, t_opt)
    R_cand = R_cw.at[problem.opt_pose_idx].set(Rn)
    t_cand = t_cw.at[problem.opt_pose_idx].set(tn)
    X_cand = X.at[:3].add(y * X[3:4] * 1e-9)
    s_norm, _, _, _ = K.cost_pm(pm, pshape, R_cand, t_cand, X_cand, problem.rig, huber)
    acc = s_norm < 1e30
    R2 = jnp.where(acc, R_cand, R_cw)
    return R2, t_cand, X_cand, lam
timeloop("v3: + step + cost + where", v3)

def make_v4(cg_iters, use_while=True):
    def v4(R_cw, t_cw, X, lam):
        flat, Cb, U = K.assemble_pm_partials(pm, pshape, R_cw, t_cw, X, problem.rig, lam, huber)
        A, a = K.finish_pose_system(flat, lam)
        rhs = a - K.rhs_corr_pm(pm, pshape, Cb, U)
        precond = inverse_6x6(A)
        def mv(x):
            corr, t = K.matvec_corr_pm(pm, pshape, Cb, U, x)
            return jnp.einsum("jab,jb->ja", A, x) - corr, t
        def ap(r): return jnp.einsum("jab,jb->ja", precond, r)
        x0 = jnp.zeros_like(rhs); z0 = ap(rhs); rz0 = jnp.sum(rhs*z0)
        rhs_sq = jnp.maximum(jnp.sum(rhs*rhs), 1e-30)
        if use_while:
            def cond(s): return jnp.logical_and(s[5] < cg_iters, jnp.sum(s[1]*s[1]) > 1e-6*rhs_sq)
            def body(s):
                x, r, z, p, rz, it = s
                Sp, _ = mv(p)
                alpha = rz / jnp.maximum(jnp.sum(p*Sp), 1e-30)
                x = x + alpha*p; r = r - alpha*Sp; z = ap(r)
                rzn = jnp.sum(r*z); beta = rzn/jnp.maximum(rz,1e-30); p = z + beta*p
                return (x, r, z, p, rzn, it+1)
            x, r, z, p, rz, it = jax.lax.while_loop(cond, body, (x0, rhs, z0, z0, rz0, jnp.int32(0)))
        else:
            x, r, z, p, rz = x0, rhs, z0, z0, rz0
            for _ in range(cg_iters):
                Sp, _ = mv(p)
                alpha = rz / jnp.maximum(jnp.sum(p*Sp), 1e-30)
                x = x + alpha*p; r = r - alpha*Sp; z = ap(r)
                rzn = jnp.sum(r*z); beta = rzn/jnp.maximum(rz,1e-30); p = z + beta*p
                rz = rzn
            it = cg_iters
        _, t = mv(x)
        x = x * 1e-9
        y = _apply_cinv(Cb, t)
        dR, dt = se3_exp(x)
        R_opt = R_cw[problem.opt_pose_idx]; t_opt = t_cw[problem.opt_pose_idx]
        Rn, tn = compose(dR, dt, R_opt, t_opt)
        R_cand = R_cw.at[problem.opt_pose_idx].set(Rn)
        t_cand = t_cw.at[problem.opt_pose_idx].set(tn)
        X_cand = X.at[:3].add(y * X[3:4] * 1e-9)
        s_norm, _, _, _ = K.cost_pm(pm, pshape, R_cand, t_cand, X_cand, problem.rig, huber)
        acc = s_norm < 1e30
        R2 = jnp.where(acc, R_cand, R_cw)
        return R2, t_cand, X_cand, lam
    return v4
timeloop("v4: full-ish, PCG while cg=1", make_v4(1, True))
timeloop("v4: full-ish, PCG unrolled cg=1", make_v4(1, False))
timeloop("v4: full-ish, PCG while cg=25", make_v4(25, True))
timeloop("v4: full-ish, PCG unrolled cg=25", make_v4(25, False))
