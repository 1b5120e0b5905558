"""Distributed point-major full BA: the Pallas engine over a device mesh.

Same parallel decomposition as parallel/sharded_ba.py (landmarks +
observations sharded over the mesh's data axis, pose system replicated via
psum over ICI -- SURVEY.md §2/§5), but running the point-major layout and the
fused Pallas kernels of ops/pallas/full_ba_pm.py on each shard:

  - the point-major planes (models/layout.py) are sharded along the landmark
    (lane) axis at block granularity -- no repacking: `shard_map` in_specs
    simply split the last axis, and each device runs the kernels over its own
    blocks with its own per-block pose-window bases;
  - per-shard pose-system partials (the flat panel sums from the assembly
    kernel -- (N_opt, 40) by default, (N_opt, 64) when
    Options.cg_precond='schur_jacobi' adds the Schur-diagonal columns --
    the matvec/rhs corrections, and the cost partials) are `psum`'d --
    6 N_opt floats per CG step, exactly the survey's all-reduce pattern;
  - landmark state (C, Cinv, b, U, back-substituted y, point updates) never
    leaves its shard.

Communication per LM iteration: one psum of the assembly panel ((N_opt, 40)
default / (N_opt, 64) schur_jacobi), one (N_opt, 6) psum per CG iteration,
and a handful of scalar psums -- at N_opt = 10k that is ~1.6 MB (2.6 MB
schur_jacobi) + 240 KB x CG iters over ICI (see comm_volume_model for the
exact accounting).
"""

from __future__ import annotations

import dataclasses
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ..models.layout import PMShape, PointMajorProblem
from ..models.problem import FinalizedProblem, ProblemShape
from ..ops.lie import compose, inverse_se3, se3_exp
from ..ops.sym6 import inverse_tri6, tri6_matvec
from ..ops.pallas import full_ba_pm as K
from ..options import IterationStatus, Options, SolverType
from ..solvers.full_ba import FullBAState, _GN_LAMBDA, _cg_tolerance
from ..solvers.full_ba_pm import (
    _apply_cinv,
    _c_times,
    gather_opt_poses,
    pm_from_finalized,
    scatter_opt_poses,
)
from ..summary import (
    INFO_ABS_STEP,
    INFO_AVG_REPROJ,
    INFO_CG_ITERS,
    INFO_COST,
    INFO_COST_CHANGE,
    INFO_DAMPING,
    INFO_NUM_COLS,
    INFO_STATUS,
    Summary,
)
from .mesh import DATA_AXIS, data_mesh

_HI = jax.lax.Precision.HIGHEST


def _psum(x):
    return jax.lax.psum(x, DATA_AXIS)


def _local_shape(pshape: PMShape, num_shards: int) -> PMShape:
    assert pshape.num_blocks % num_shards == 0, (
        "num_blocks must divide evenly over shards "
        "(build the layout with pad_blocks_to=num_shards)"
    )
    return dataclasses.replace(
        pshape, padded_points=pshape.padded_points // num_shards
    )


def pm_in_specs() -> PointMajorProblem:
    """PartitionSpecs for the point-major planes (landmark lane axis split
    over the data axis at block granularity). Public so multi-host launchers
    can `mesh.to_global` the planes before jit."""
    return PointMajorProblem(
        obs_f32=P(None, DATA_AXIS),
        slot_pose=P(None, DATA_AXIS),
        slot_opt=P(None, DATA_AXIS),
        X=P(None, DATA_AXIS),
        point_ref=P(DATA_AXIS),
        gbase=P(DATA_AXIS),
        sbase=P(DATA_AXIS),
    )


def comm_volume_model(
    num_opt_poses: int, cg_iterations: int, dtype_bytes: int = 4,
    emit_schur: bool = False,
) -> dict:
    """Per-LM-iteration all-reduce (psum) volume of the sharded PM engine,
    as machine-readable bytes (the prose model in the module docstring).

    Counted from the `_psum` call sites in `_device_program`:
      - assembly panel (N_opt, 40 cols; 64 with the fused Schur-Jacobi
        preconditioner columns): once per LM iteration;
      - matvec pose-correction (N_opt, 6): once per CG iteration;
      - scalars (candidate cost, predicted point decrease, point step norm):
        three per LM iteration (plus once-per-solve n_params/RMSE scalars,
        excluded here).
    """
    cols = K.A_COLS_SCHUR if emit_schur else K.A_COLS
    assembly = num_opt_poses * cols * dtype_bytes
    per_cg = num_opt_poses * 6 * dtype_bytes
    scalars = 3 * dtype_bytes
    return {
        "num_opt_poses": num_opt_poses,
        "cg_iterations_per_lm": cg_iterations,
        "assembly_panel_bytes": assembly,
        "cg_matvec_bytes_per_cg_iter": per_cg,
        "scalar_bytes_per_lm_iter": scalars,
        "total_bytes_per_lm_iter": assembly + cg_iterations * per_cg + scalars,
    }


@functools.partial(
    jax.jit, static_argnames=("pshape", "options", "num_shards", "interpret")
)
def _solve_sharded_pm_jax(
    pm: PointMajorProblem,
    pshape: PMShape,
    rig,
    R_cw0,
    t_cw0,
    opt_pose_idx,
    options: Options,
    num_shards: int,
    interpret: bool = False,
):
    mesh = data_mesh(num_shards)
    lshape = _local_shape(pshape, num_shards)

    pm_specs = pm_in_specs()
    out_specs = (
        P(),  # R_cw
        P(),  # t_cw
        P(None, DATA_AXIS),  # X (4, Mp)
        P(),  # converged
        P(),  # iters
        P(),  # info
        P(),  # num_info
        P(),  # final cost
        P(),  # final rmse
    )
    program = functools.partial(
        _device_program,
        lshape=lshape,
        options=options,
        interpret=interpret,
    )
    return jax.shard_map(
        program,
        mesh=mesh,
        in_specs=(pm_specs, P(), P(), P(), P()),
        out_specs=out_specs,
        # pallas_call's out_shape structs carry no varying-mesh-axis info,
        # which trips shard_map's vma checker; collectives here are explicit.
        check_vma=False,
    )(pm, rig, R_cw0, t_cw0, opt_pose_idx)


def _device_program(pm_local, rig, R_cw0, t_cw0, opt_pose_idx, *, lshape,
                    options, interpret):
    """Per-device LM loop on the local point-major shard."""
    opts = options
    shape = lshape
    max_iter = opts.iteration_handle.max_num_iterations
    huber = opts.outlier_handle.threshold_huber_loss * shape.scale
    thr_step = opts.convergence_handle.threshold_step_size
    thr_cost = opts.convergence_handle.threshold_cost_change
    tr = opts.trust_region_handle
    inv_scale = 1.0 / shape.scale
    metric = getattr(opts, "cost_metric", "reference")
    dtype = jnp.float32
    n_obs = shape.num_observations
    is_lm = opts.solver_type == SolverType.LEVENBERG_MARQUARDT
    is_gd = opts.solver_type == SolverType.GRADIENT_DESCENT
    n_params = shape.num_opt_poses + _psum(jnp.sum(pm_local.X[3]))

    def eval_cost(R_cw, t_cw, X):
        s_norm, s_wsq, _, _ = K.cost_pm(
            pm_local, shape, R_cw, t_cw, X, rig, huber, interpret=interpret
        )
        return _psum(s_wsq if metric == "squared" else s_norm)

    use_schur = getattr(opts, "cg_precond", "jacobi") == "schur_jacobi"
    warm = getattr(opts, "cg_warm_start", False)

    def pcg(Cb, U, Atri, rhs, precond_tri, tol, x_start):
        """Unfused PCG (solvers/full_ba_pm.unfused_pcg) with the shard-
        local correction psum'd across the data axis (t stays local)."""
        from ..solvers.full_ba_pm import unfused_pcg

        def corr_fn(x):
            corr, t = K.matvec_corr_pm(
                pm_local, shape, Cb, U, x, interpret=interpret
            )
            return _psum(corr), t

        return unfused_pcg(
            shape.padded_points, Atri, rhs, precond_tri,
            opts.cg_max_iterations, tol, corr_fn, x0=x_start,
        )

    def pcg_fused(Cb, U, Atri, rhs, precond_tri, tol, x_start):
        """Fused PCG (ops/pallas/cg_step.py) via the shared plane driver.
        The pose system is replicated across shards, so the kernel runs
        identically per device on the psum'd correction; only t = B^T x
        stays shard-local."""
        from ..solvers.full_ba_pm import fused_pcg_planes

        def corr_fn(x):
            corr, t = K.matvec_corr_pm(
                pm_local, shape, Cb, U, x, interpret=interpret
            )
            return _psum(corr), t

        return fused_pcg_planes(
            shape.num_opt_poses, shape.padded_points, Atri, rhs,
            precond_tri, opts.cg_max_iterations, tol, interpret, corr_fn,
            x0=x_start,
        )

    from ..ops.pallas.cg_step import MAX_FUSED_POSES

    if (getattr(opts, "cg_fused_step", True)
            and shape.num_opt_poses <= MAX_FUSED_POSES):
        pcg = pcg_fused

    def body(c):
        (R_cw, t_cw, X, lam, prev_cost, it, done, converged, info,
         num_info, x_prev, rhs_norm_prev, eta_prev) = c
        lam_eff = lam if is_lm else jnp.asarray(_GN_LAMBDA, dtype)
        flat, Cb, U = K.assemble_pm_partials(
            pm_local, shape, R_cw, t_cw, X, rig, lam_eff, huber,
            interpret=interpret,
            u_dtype=getattr(opts, "coupling_dtype", "float32"),
            emit_schur=use_schur,
        )
        flat_g = _psum(flat)
        Atri, a, rhs = K.finish_pose_system_tri(flat_g, lam_eff)

        if is_gd:
            def clip_blocks(g, clip):
                norms = jnp.linalg.norm(g, axis=0, keepdims=True)
                return g * jnp.minimum(1.0, clip / jnp.maximum(norms, 1e-30))

            x = clip_blocks(a.T, opts.gd_step_clip).T
            y = clip_blocks(Cb[6:9], opts.gd_step_clip)
            cg_it = jnp.asarray(0, jnp.int32)
            eta = jnp.asarray(0.0, dtype)
            rhs_norm = jnp.asarray(0.0, dtype)
        else:
            # rhs = a - B Cinv b arrives fused from the (psum'd) assembly;
            # the Schur-Jacobi blocks ride the same psum (flat[:, 33:54]).
            precond_tri = inverse_tri6(
                K.schur_precond_tri(flat_g, lam_eff) if use_schur else Atri
            )
            tol, eta, rhs_norm = _cg_tolerance(
                opts, rhs, rhs_norm_prev, eta_prev
            )
            x, t, cg_it = pcg(
                Cb, U, Atri, rhs, precond_tri, tol,
                x_prev if warm else None,
            )
            y = _apply_cinv(Cb, t)

        dR, dt = se3_exp(x)
        R_opt, t_opt = gather_opt_poses(R_cw, t_cw, opt_pose_idx, shape)
        R_new, t_new = compose(dR, dt, R_opt, t_opt)
        R_cand, t_cand = scatter_opt_poses(
            R_cw, t_cw, R_new, t_new, opt_pose_idx, shape
        )
        X_cand = X.at[:3].add(y * X[3:4])

        current_cost = eval_cost(R_cand, t_cand, X_cand)
        # NaN/inf guard (see solvers/full_ba.py).
        cost_ok = jnp.isfinite(current_cost)

        if is_lm:
            term_pose = jnp.sum(a * x) + jnp.sum(x * tri6_matvec(Atri, x))
            b_pl = Cb[6:9]
            Cy = _c_times(Cb, y)
            term_point = _psum(
                jnp.sum(b_pl * y) + jnp.sum(y * Cy)
                + 2.0 * jnp.sum(y * (b_pl - Cy))
            )
            model_decrease = -(term_pose + term_point)
            rho = (current_cost - prev_cost) * inv_scale / model_decrease
            accept = jnp.logical_and(rho > tr.threshold_update, cost_ok)
            trust_more = jnp.logical_and(rho > tr.threshold_trust_more, cost_ok)
            lam_new = jnp.where(
                trust_more,
                jnp.maximum(tr.min_lambda, lam * tr.decrease_ratio_lambda),
                jnp.where(
                    rho <= tr.threshold_update,
                    jnp.minimum(tr.max_lambda, lam * tr.increase_ratio_lambda),
                    lam,
                ),
            )
            status = jnp.where(
                trust_more,
                float(int(IterationStatus.UPDATE_TRUST_MORE)),
                jnp.where(
                    accept,
                    float(int(IterationStatus.UPDATE)),
                    float(int(IterationStatus.SKIPPED)),
                ),
            )
        else:
            accept = cost_ok
            lam_new = lam
            status = jnp.asarray(float(int(IterationStatus.UPDATE)), dtype)

        R_next = jnp.where(accept, R_cand, R_cw)
        t_next = jnp.where(accept, t_cand, t_cw)
        X_next = jnp.where(accept, X_cand, X)

        cost_change = jnp.abs(current_cost - prev_cost)
        step_pose = jnp.sum(jnp.linalg.norm(x, axis=-1))
        step_point = _psum(
            jnp.sum(jnp.sqrt(jnp.maximum(jnp.sum(y * y, axis=0), 0.0)) * X[3])
        )
        avg_step = (step_pose + step_point) / n_params
        conv_now = jnp.logical_or(avg_step < thr_step, cost_change < thr_cost)
        at_last = it >= max_iter - 1
        converged = jnp.where(at_last, False, conv_now)

        skipped = jnp.logical_not(accept)
        row = jnp.zeros((INFO_NUM_COLS,), dtype=dtype)
        row = row.at[INFO_COST].set(jnp.where(skipped, prev_cost, current_cost))
        row = row.at[INFO_COST_CHANGE].set(jnp.where(skipped, 0.0, cost_change))
        row = row.at[INFO_AVG_REPROJ].set(
            jnp.where(
                skipped,
                jnp.sqrt(prev_cost / n_obs),
                current_cost / n_obs,
            )
        )
        row = row.at[INFO_ABS_STEP].set(avg_step)
        row = row.at[INFO_DAMPING].set(lam_new)
        row = row.at[INFO_STATUS].set(status)
        row = row.at[INFO_CG_ITERS].set(cg_it.astype(dtype))

        return (
            R_next, t_next, X_next, lam_new,
            jnp.where(cost_ok, current_cost, prev_cost), it + 1,
            jnp.logical_or(conv_now, at_last), converged,
            info.at[it].set(row), num_info + 1,
            x, rhs_norm, eta,
        )

    def cond(c):
        return jnp.logical_and(c[5] < max_iter, jnp.logical_not(c[6]))

    carry0 = (
        R_cw0,
        t_cw0,
        pm_local.X,
        jnp.asarray(tr.initial_lambda, dtype),
        eval_cost(R_cw0, t_cw0, pm_local.X),
        jnp.asarray(0, jnp.int32),
        jnp.asarray(False),
        jnp.asarray(False),
        jnp.zeros((max_iter, INFO_NUM_COLS), dtype=dtype),
        jnp.asarray(0, jnp.int32),
        jnp.zeros((shape.num_opt_poses, 6), jnp.float32),
        jnp.asarray(0.0, dtype),
        jnp.asarray(0.0, dtype),
    )
    (R_cw, t_cw, X, lam, final_cost, it, _, converged, info,
     num_info, _, _, _) = jax.lax.while_loop(cond, body, carry0)

    _, _, s_sq, s_cnt = K.cost_pm(
        pm_local, shape, R_cw, t_cw, X, rig, huber, interpret=interpret
    )
    rmse_px = jnp.sqrt(
        _psum(s_sq) / jnp.maximum(_psum(s_cnt), 1.0)
    ) * inv_scale

    return (R_cw, t_cw, X, converged, it, info, num_info, final_cost,
            rmse_px)


def solve_sharded_pm(
    problem: FinalizedProblem,
    shape: ProblemShape,
    options: Options,
    num_shards: int | None = None,
    host: dict | None = None,
    interpret: bool | None = None,
) -> tuple[FullBAState, Summary]:
    """Host entry: build a shard-aligned point-major layout, shard_map the
    Pallas LM program over the mesh, return user-facing results."""
    if num_shards is None:
        num_shards = len(jax.devices())
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    res = pm_from_finalized(
        problem, shape, host=host, pad_blocks_to=num_shards
    )
    if res is None:
        raise ValueError(
            "problem exceeds point-major static bounds; use "
            "parallel.sharded_ba.solve_sharded"
        )
    pm, pshape = res

    t0 = time.perf_counter()
    out = _solve_sharded_pm_jax(
        pm, pshape, problem.rig, problem.R_cw, problem.t_cw,
        problem.opt_pose_idx, options, num_shards, interpret=interpret,
    )
    (R_cw, t_cw, Xpm, converged, iters, info, num_info, final_cost,
     rmse_px) = jax.block_until_ready(out)
    total_ms = (time.perf_counter() - t0) * 1e3

    inv_scale = 1.0 / shape.scale
    t_user = t_cw * inv_scale
    R_wc, t_wc = inverse_se3(R_cw, t_user)
    N = R_wc.shape[0]
    T = jnp.zeros((N, 4, 4), jnp.float32)
    T = T.at[:, :3, :3].set(R_wc)
    T = T.at[:, :3, 3].set(t_wc)
    T = T.at[:, 3, 3].set(1.0)

    ref = np.asarray(pm.point_ref)
    Xh = np.asarray(Xpm)
    points = np.zeros((shape.num_points, 3), np.float32)
    live = ref >= 0
    points[ref[live]] = Xh[:3, live].T
    points = jnp.asarray(points) * inv_scale

    state = FullBAState(
        poses_world_to_camera=T,
        points=points,
        converged=converged,
        num_iterations=iters,
        info=info,
        num_info=num_info,
        final_cost=final_cost,
        final_rmse_px=rmse_px,
    )
    summary = Summary.from_device_buffers(
        info=np.asarray(info),
        num_iterations=int(num_info),
        converged=bool(converged),
        max_iteration=options.iteration_handle.max_num_iterations,
        threshold_step_size=options.convergence_handle.threshold_step_size,
        threshold_cost_change=options.convergence_handle.threshold_cost_change,
        total_time_ms=total_ms,
        final_rmse_px=float(rmse_px),
    )
    return state, summary
