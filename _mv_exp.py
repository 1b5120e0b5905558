# Experiment: matvec variants, measured end-to-end via 20-iter solve.
import time
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import functools
from bundle_adjustment_solver_tpu.models.problem import finalized_from_arrays
from bundle_adjustment_solver_tpu.solvers import full_ba_pm
from bundle_adjustment_solver_tpu.ops.pallas import full_ba_pm as K
from bundle_adjustment_solver_tpu.options import *
from bundle_adjustment_solver_tpu.utils.synthetic import corridor_ba_problem

prob = corridor_ba_problem(num_poses=2000, num_points=200_000, window=6, seed=123)
fixed = np.zeros(2000, bool); fixed[prob.fixed_pose_ids] = True
problem, shape, host = finalized_from_arrays(prob.cameras, prob.poses_initial, prob.points_initial,
    prob.obs_camera, prob.obs_pose, prob.obs_point, prob.obs_pixel, fixed_pose_mask=fixed, return_host=True)
pm, pshape = full_ba_pm.pm_from_finalized(problem, shape, host=host)
dev = jax.devices()[0]
pm = jax.device_put(pm, dev); problem = jax.device_put(problem, dev)
huber = 1.0 * shape.scale

flat, Cb, U = K.assemble_pm_partials(pm, pshape, problem.R_cw, problem.t_cw, pm.X, problem.rig, jnp.float32(1.0), huber)
Atri, a = K.finish_pose_system_tri(flat, jnp.float32(1.0))
Cb, U, a = jax.device_put((Cb, U, a), dev)
_ = float(jnp.sum(a))
HI = jax.lax.Precision.HIGHEST

Kp, bm, P = pshape.slots, pshape.block_points, pshape.window
Mp, nblocks = pshape.padded_points, pshape.num_blocks
n_opt = pshape.num_opt_poses

def kern_v2(sbase_ref, x_tbl_ref, U_ref, Cb_ref, sopt_ref, out_pan_ref, t_ref):
    i = pl.program_id(0)
    sbase = sbase_ref[i]
    x_win = x_tbl_ref[pl.ds(sbase, P), :]
    idx = sopt_ref[:] - sbase  # (Kp, bm)
    oh3 = (jax.lax.broadcasted_iota(jnp.int32, (P, Kp, bm), 0) == idx[None]).astype(jnp.float32)
    Up = [U_ref[e].astype(jnp.float32) for e in range(18)]
    # gather: (8, Kp, bm) via 3D dot
    xg = jax.lax.dot_general(x_win, oh3, (((0,), (0,)), ((), ())), precision=HI,
                             preferred_element_type=jnp.float32)
    t = []
    for cpt in range(3):
        acc = Up[cpt] * xg[0]
        for a_ in range(1, 6):
            acc = acc + Up[a_ * 3 + cpt] * xg[a_]
        t.append(jnp.sum(acc, axis=0, keepdims=True))
    for cpt in range(3):
        t_ref[cpt:cpt+1, :] = t[cpt]
    t_ref[3:4, :] = jnp.zeros((1, bm), jnp.float32)
    ci = [Cb_ref[9+n:10+n, :] for n in range(6)]
    v0 = ci[0]*t[0] + ci[1]*t[1] + ci[2]*t[2]
    v1 = ci[1]*t[0] + ci[3]*t[1] + ci[4]*t[2]
    v2 = ci[2]*t[0] + ci[4]*t[1] + ci[5]*t[2]
    rows = [Up[a_*3]*v0 + Up[a_*3+1]*v1 + Up[a_*3+2]*v2 for a_ in range(6)]
    w3 = jnp.stack(rows + [jnp.zeros((Kp, bm), jnp.float32)]*2, axis=0)  # (8, Kp, bm)
    # scatter: (P, 8) via 2-contraction dot
    pan = jax.lax.dot_general(oh3, w3, (((1, 2), (1, 2)), ((), ())), precision=HI,
                              preferred_element_type=jnp.float32)
    out_pan_ref[0] = pan

def run_matvec_v2(pm, Cb, U, x):
    x_tbl = jnp.zeros((n_opt + P, 8), jnp.float32).at[:n_opt, :6].set(x)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(nblocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((18, Kp, bm), lambda i, *_: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((16, bm), lambda i, *_: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((Kp, bm), lambda i, *_: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, P, 8), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, bm), lambda i, *_: (0, i), memory_space=pltpu.VMEM),
        ],
    )
    pan, t = pl.pallas_call(kern_v2, grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((nblocks, P, 8), jnp.float32),
                   jax.ShapeDtypeStruct((4, Mp), jnp.float32)])(pm.sbase, x_tbl, U, Cb, pm.slot_opt)
    corr = K._second_level(pan, pm.sbase, n_opt, P, 8)[:, :6]
    return corr, t

# correctness
x = jnp.asarray(np.random.default_rng(0).standard_normal((n_opt, 6)).astype(np.float32))
c1, t1 = K.matvec_corr_pm(pm, pshape, Cb, U, x)
print("|corr|:", float(jnp.max(jnp.abs(c1))))

REPS = 50
def bench(name, fn):
    @jax.jit
    def run(pm, Cb, U, x):
        def body(i, acc):
            c, t = fn(pm, Cb, U, x + acc*1e-30)
            return acc + c[0, 0] * 1e-20
        return jax.lax.fori_loop(0, REPS, body, jnp.float32(0))
    _ = float(run(pm, Cb, U, x))
    t0 = time.perf_counter()
    _ = float(run(pm, Cb, U, x))
    print(f"{name}: {((time.perf_counter()-t0)*1e3-45)/REPS:.3f} ms/matvec")

bench("current matvec_corr_pm", lambda pm, Cb, U, x: K.matvec_corr_pm(pm, pshape, Cb, U, x))

