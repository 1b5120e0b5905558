#!/usr/bin/env python
"""Roofline study of `assemble_pm` and `cost_pm` at flagship scale.

VERDICT r4 missing #3: the CG matvec got a published component roofline
(PERF.md: 95% of floor); the assembly (~5 ms, now the largest single
kernel per EW-era LM iteration) and the candidate-cost pass (~1.7 ms)
never did. This measures both kernels and a ladder of PHASE-STUBBED
variants (same Pallas grid/BlockSpecs, later phases removed) on the real
chip, xplane device time over K in-jit calls, and combines the deltas
with exact DMA byte counts into a per-component floor.

The stub ladder (each variant still writes every declared output, so the
output-DMA cost stays constant across the ladder and deltas isolate
COMPUTE):

  assemble: gather  -> + warp/project -> + Jacobian/Hessian accum
            -> + panel scatter (= full, emit_schur both ways)
  cost:     gather  -> full

Usage (real chip): python benchmarks/assemble_cost_roofline.py [K]
Writes benchmarks/assemble_cost_roofline.json; PERF.md cites it.

Reference anchor: the observation loop these kernels fuse,
/root/reference/core/full_bundle_adjustment_solver.cpp:716-831.
"""

import functools
import json
import os
import shutil
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from bundle_adjustment_solver_tpu.ops.pallas import full_ba_pm as K
from bundle_adjustment_solver_tpu.utils.synthetic import (
    corridor_problem_on_device,
)

NUM_POSES = int(os.environ.get("BENCH_POSES", 10_000))
NUM_POINTS = int(os.environ.get("BENCH_POINTS", 1_000_000))
CALLS = int(sys.argv[1]) if len(sys.argv) > 1 else 20


# ---------------------------------------------------------------------------
# Phase-stubbed assembly kernel (VMEM-table mode only -- the flagship's).
# ---------------------------------------------------------------------------

def _asm_variant_kernel(shape, emit_schur, phase, gbase_ref, sbase_ref,
                        pose_tbl_ref, cam_ref, scal_ref, obs_ref, spose_ref,
                        sopt_ref, X_ref, U_ref, Cb_ref, Apan_ref):
    Kp, C, bm, P = shape.slots, shape.cams, shape.block_points, shape.window
    i = pl.program_id(0)
    gbase = gbase_ref[i]
    sbase = sbase_ref[i]
    lam = scal_ref[0, 0]
    huber = scal_ref[0, 1]

    idx_g = spose_ref[:] - gbase
    g = K._gather_window(pose_tbl_ref, gbase, P, idx_g, 16).reshape(
        16, Kp, bm
    )

    zK = jnp.zeros((Kp, bm), jnp.float32)
    z1 = jnp.zeros((1, bm), jnp.float32)

    if phase == "gather":
        # Keep g live through a cheap reduction so the gather cannot fold.
        Cb_ref[:] = jnp.broadcast_to(
            jnp.sum(g, axis=(0, 1), keepdims=True)[0], (16, bm)
        )
        for e in range(18):
            U_ref[e] = zK
        Apan_ref[:] = jnp.zeros_like(Apan_ref)
        return

    X_blk = X_ref[:]
    pmask = X_blk[3:4, :]
    per_cam, (xr, yr, zr) = K._warp_and_project(
        shape, g, X_blk, obs_ref[:], cam_ref, huber
    )

    if phase == "warp":
        acc = z1
        for c in range(C):
            acc = acc + jnp.sum(
                per_cam[c]["w"] * per_cam[c]["ru"], axis=0, keepdims=True
            )
        Cb_ref[:] = jnp.broadcast_to(acc, (16, bm))
        for e in range(18):
            U_ref[e] = zK
        Apan_ref[:] = jnp.zeros_like(Apan_ref)
        return

    Rjw = [g[i_] for i_ in range(9)]
    Csym = [z1 for _ in range(6)]
    bvec = [z1 for _ in range(3)]
    Ue = [zK for _ in range(18)]
    Atri = [zK for _ in range(21)]
    avec = [zK for _ in range(6)]
    slot_use = zK
    for c in range(C):
        cam = per_cam[c]
        w, ru, rv = cam["w"], cam["ru"], cam["rv"]
        Qu, Qv, Rju, Rjv = K._jacobians(cam, (xr, yr, zr, Rjw))
        slot_use = jnp.maximum(slot_use, cam["valid"])
        for n_, (a_, b2) in enumerate(
            [(0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2)]
        ):
            contrib = w * (Rju[a_] * Rju[b2] + Rjv[a_] * Rjv[b2])
            Csym[n_] = Csym[n_] + jnp.sum(contrib, axis=0, keepdims=True)
        for a_ in range(3):
            contrib = -w * (Rju[a_] * ru + Rjv[a_] * rv)
            bvec[a_] = bvec[a_] + jnp.sum(contrib, axis=0, keepdims=True)
        for a_ in range(6):
            for b2 in range(3):
                Ue[a_ * 3 + b2] = Ue[a_ * 3 + b2] + w * (
                    Qu[a_] * Rju[b2] + Qv[a_] * Rjv[b2]
                )
        for n_, (a_, b2) in enumerate(K._TRI6):
            Atri[n_] = Atri[n_] + w * (Qu[a_] * Qu[b2] + Qv[a_] * Qv[b2])
        for a_ in range(6):
            avec[a_] = avec[a_] - w * (Qu[a_] * ru + Qv[a_] * rv)

    damp = 1.0 + lam
    Cd = [Csym[n_] * pmask for n_ in range(6)]
    Cd[0] = Cd[0] * damp
    Cd[3] = Cd[3] * damp
    Cd[5] = Cd[5] * damp
    Cinv = K._inverse_sym3(Cd)
    for n_ in range(6):
        Cb_ref[n_ : n_ + 1, :] = Cd[n_]
        Cb_ref[9 + n_ : 10 + n_, :] = Cinv[n_]
    for a_ in range(3):
        Cb_ref[6 + a_ : 7 + a_, :] = bvec[a_] * pmask
    Cb_ref[15:16, :] = jnp.sum(slot_use, axis=0, keepdims=True)
    for e in range(18):
        U_ref[e] = (Ue[e] * pmask).astype(U_ref.dtype)

    b0 = bvec[0] * pmask
    b1 = bvec[1] * pmask
    b2_ = bvec[2] * pmask
    v0 = Cinv[0] * b0 + Cinv[1] * b1 + Cinv[2] * b2_
    v1 = Cinv[1] * b0 + Cinv[3] * b1 + Cinv[4] * b2_
    v2 = Cinv[2] * b0 + Cinv[4] * b1 + Cinv[5] * b2_
    Um = [Ue[e] * pmask for e in range(18)]
    rhs_rows = [
        Um[a_ * 3] * v0 + Um[a_ * 3 + 1] * v1 + Um[a_ * 3 + 2] * v2
        for a_ in range(6)
    ]
    schur_rows = []
    if emit_schur:
        for a_ in range(6):
            ua0, ua1, ua2 = Um[a_ * 3], Um[a_ * 3 + 1], Um[a_ * 3 + 2]
            wa0 = ua0 * Cinv[0] + ua1 * Cinv[1] + ua2 * Cinv[2]
            wa1 = ua0 * Cinv[1] + ua1 * Cinv[3] + ua2 * Cinv[4]
            wa2 = ua0 * Cinv[2] + ua1 * Cinv[4] + ua2 * Cinv[5]
            for b_ in range(a_, 6):
                schur_rows.append(
                    wa0 * Um[b_ * 3] + wa1 * Um[b_ * 3 + 1]
                    + wa2 * Um[b_ * 3 + 2]
                )

    if phase == "math":
        # Everything computed; panel scatter (and its one-hot) skipped.
        # Keep the accumulators live through one cheap row write.
        probe = Atri[0] + avec[0] + rhs_rows[0]
        probe = probe + (schur_rows[0] if schur_rows else zK)
        Apan_ref[:] = jnp.broadcast_to(
            jnp.sum(probe, axis=0, keepdims=True)[:, : Apan_ref.shape[2]],
            Apan_ref.shape[1:],
        )[None]
        return

    cols = (K.A_COLS_SCHUR if emit_schur else K.A_COLS)
    used = 33 + len(schur_rows)
    idx_s = sopt_ref[:] - sbase
    contrib = jnp.concatenate(
        [Atri[n_].reshape(1, Kp * bm) for n_ in range(21)]
        + [avec[a_].reshape(1, Kp * bm) for a_ in range(6)]
        + [rhs_rows[a_].reshape(1, Kp * bm) for a_ in range(6)]
        + [schur_rows[n_].reshape(1, Kp * bm) for n_ in range(len(schur_rows))]
        + [jnp.zeros((cols - used, Kp * bm), jnp.float32)],
        axis=0,
    )
    if phase == "full_fused":
        K._scatter_window_hilo_fused(Apan_ref, P, idx_s, contrib)
    else:
        K._scatter_window_hilo(Apan_ref, P, idx_s, contrib)


def _cost_variant_kernel(shape, phase, gbase_ref, pose_tbl_ref, cam_ref,
                         scal_ref, obs_ref, spose_ref, X_ref, cost_ref):
    Kp, C, bm, P = shape.slots, shape.cams, shape.block_points, shape.window
    i = pl.program_id(0)
    gbase = gbase_ref[i]
    huber = scal_ref[0, 1]
    idx_g = spose_ref[:] - gbase
    g = K._gather_window(pose_tbl_ref, gbase, P, idx_g, 16).reshape(
        16, Kp, bm
    )
    if phase == "gather":
        s = jnp.sum(g)
    else:
        per_cam, _ = K._warp_and_project(
            shape, g, X_ref[:], obs_ref[:], cam_ref, huber
        )
        s = jnp.float32(0)
        for c in range(C):
            cam = per_cam[c]
            s = s + jnp.sum(cam["w"] * (cam["ru"] ** 2 + cam["rv"] ** 2))
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    row = jnp.where(lane == 0, s, 0.0)

    @pl.when(i == 0)
    def _():
        cost_ref[:] = row

    @pl.when(i > 0)
    def _():
        cost_ref[:] = cost_ref[:] + row


def _cost_variant(pm, shape, pose_tbl, X, rig, huber, phase):
    Kp, C, bm, P = shape.slots, shape.cams, shape.block_points, shape.window
    nblocks = shape.num_blocks
    cam_tbl = K._cam_table(rig)
    scal = jnp.stack(
        [jnp.asarray(0.0, jnp.float32), jnp.asarray(huber, jnp.float32)]
    ).reshape(1, 2)
    from jax.experimental.pallas import tpu as pltpu

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((3 * Kp * C, bm), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Kp, bm), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, bm), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 128), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    (out,) = pl.pallas_call(
        functools.partial(_cost_variant_kernel, shape, phase),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((1, 128), jnp.float32)],
    )(pm.gbase, pose_tbl, cam_tbl, scal, pm.obs_f32, pm.slot_pose, X)
    return out


def _asm_variant(pm, shape, pose_tbl, X, rig, lam, huber, phase,
                 emit_schur):
    Kp, C, bm, P = shape.slots, shape.cams, shape.block_points, shape.window
    Mp, nblocks = shape.padded_points, shape.num_blocks
    cols = K.A_COLS_SCHUR if emit_schur else K.A_COLS
    cam_tbl = K._cam_table(rig)
    scal = jnp.stack([lam, jnp.asarray(huber, jnp.float32)]).reshape(1, 2)
    from jax.experimental.pallas import tpu as pltpu

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((3 * Kp * C, bm), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Kp, bm), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Kp, bm), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, bm), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((18, Kp, bm), lambda i, *_: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((16, bm), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, P, cols), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    U, Cb, Apan = pl.pallas_call(
        functools.partial(_asm_variant_kernel, shape, emit_schur, phase),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((18, Kp, Mp), jnp.float32),
            jax.ShapeDtypeStruct((16, Mp), jnp.float32),
            jax.ShapeDtypeStruct((nblocks, P, cols), jnp.float32),
        ],
    )(pm.gbase, pm.sbase, pose_tbl, cam_tbl, scal, pm.obs_f32,
      pm.slot_pose, pm.slot_opt, X)
    return U, Cb, Apan


def _timed_kernel_ms(trace_fn, calls):
    """Run trace_fn under a profiler trace; return {op_name: ms/call} for
    the dominant custom-call ops (those with >= calls occurrences)."""
    from bundle_adjustment_solver_tpu.utils.profiling import _xla_ops_line

    trace_dir = tempfile.mkdtemp(prefix="roofline_trace_")
    try:
        with jax.profiler.trace(trace_dir):
            trace_fn()
        got = _xla_ops_line(trace_dir)
        if got is None:
            return {}
        meta, events = got
        totals = {}
        counts = {}
        for ev in events:
            name = meta.get(ev.metadata_id, str(ev.metadata_id))
            totals[name] = totals.get(name, 0.0) + ev.duration_ps / 1e9
            counts[name] = counts.get(name, 0) + 1
        out = {}
        for name, ms in sorted(totals.items(), key=lambda kv: -kv[1])[:6]:
            if counts[name] >= calls and "while" not in name:
                out[name] = ms / counts[name]
        return out
    finally:
        shutil.rmtree(trace_dir, ignore_errors=True)


def main():
    print("devices:", jax.devices())
    problem, shape, _host, pm, pshape = corridor_problem_on_device(
        NUM_POSES, NUM_POINTS, window=6, seed=123
    )
    Kp, C, bm, P = (pshape.slots, pshape.cams, pshape.block_points,
                    pshape.window)
    Mp, nblocks = pshape.padded_points, pshape.num_blocks
    tbl = K.pose_table(problem.R_cw, problem.t_cw, P)
    huber = 1.0 * pshape.scale
    X = pm.X

    # NEVER closure-capture the big device arrays into jit: the tunnel's
    # compile service rejects the constant-laden HLO (HTTP 413, CLAUDE.md).
    def loop_assemble(variant=None, emit_schur=True):
        @functools.partial(jax.jit, static_argnames=())
        def run(pm_, tbl_, X_, rig_):
            def body(i, acc):
                lam = jnp.float32(2.0) * (1.0 + acc * 1e-30)
                if variant is None:
                    flat, Cb, _ = K.assemble_pm_tbl(
                        pm_, pshape, tbl_, X_, rig_, lam, huber,
                        emit_schur=emit_schur,
                    )
                    return acc + flat[0, 0] * 1e-30
                U, Cb, Apan = _asm_variant(
                    pm_, pshape, tbl_, X_, rig_, lam, huber, variant,
                    emit_schur,
                )
                return acc + Cb[0, 0] * 1e-30

            return jax.lax.fori_loop(0, CALLS, body, jnp.float32(0.0))

        return lambda: run(pm, tbl, X, problem.rig)

    def loop_cost():
        @jax.jit
        def run(pm_, tbl_, X_, rig_):
            def body(i, acc):
                h = huber * (1.0 + acc * 1e-30)
                s_norm, s_wsq, s_sq, s_cnt = K.cost_pm_tbl(
                    pm_, pshape, tbl_, X_, rig_, h
                )
                return acc + s_norm * 1e-30

            return jax.lax.fori_loop(0, CALLS, body, jnp.float32(0.0))

        return lambda: run(pm, tbl, X, problem.rig)

    def loop_cost_variant(phase):
        @jax.jit
        def run(pm_, tbl_, X_, rig_):
            def body(i, acc):
                h = huber * (1.0 + acc * 1e-30)
                out = _cost_variant(pm_, pshape, tbl_, X_, rig_, h, phase)
                return acc + out[0, 0] * 1e-30

            return jax.lax.fori_loop(0, CALLS, body, jnp.float32(0.0))

        return lambda: run(pm, tbl, X, problem.rig)

    results = {}
    runs = [
        ("assemble_full_schur", loop_assemble(None, True)),
        ("assemble_full_noschur", loop_assemble(None, False)),
        ("assemble_fusedscatter_schur", loop_assemble("full_fused", True)),
        ("assemble_fusedscatter_noschur", loop_assemble("full_fused", False)),
        ("assemble_math_schur", loop_assemble("math", True)),
        ("assemble_math_noschur", loop_assemble("math", False)),
        ("assemble_warp", loop_assemble("warp", True)),
        ("assemble_gather", loop_assemble("gather", True)),
        ("cost_full", loop_cost()),
        ("cost_warp_variant", loop_cost_variant("warp")),
        ("cost_gather_variant", loop_cost_variant("gather")),
    ]
    for name, fn in runs:
        float(np.asarray(fn()))  # compile + warm
        ops = _timed_kernel_ms(lambda f=fn: float(np.asarray(f())), CALLS)
        if not ops:
            print(f"{name}: NO TRACE (not a TPU backend?)")
            continue
        top = max(ops.items(), key=lambda kv: kv[1])
        results[name] = {"ms_per_call": round(top[1], 4), "op": top[0],
                         "all_ops": {k: round(v, 4) for k, v in ops.items()}}
        print(f"{name:>24}: {top[1]:.4f} ms/call ({top[0]})")

    # ---- Exact DMA byte counts per kernel call (the hard floor) ----------
    def mb(x):
        return round(x / 1e6, 1)

    obs_rd = 3 * Kp * C * Mp * 4
    x_rd = 4 * Mp * 4
    slot_rd = Kp * Mp * 4  # slot_pose
    sopt_rd = Kp * Mp * 4
    u_wr = 18 * Kp * Mp * 4
    cb_wr = 16 * Mp * 4
    pan_wr_schur = nblocks * P * K.A_COLS_SCHUR * 4
    pan_wr = nblocks * P * K.A_COLS * 4
    asm_bytes_schur = (obs_rd + x_rd + slot_rd + sopt_rd + u_wr + cb_wr
                       + pan_wr_schur)
    asm_bytes = (obs_rd + x_rd + slot_rd + sopt_rd + u_wr + cb_wr + pan_wr)
    cost_bytes = obs_rd + x_rd + slot_rd
    HBM_BW = 600e9  # sustained v5e HBM (bench-calibrated figure, PERF.md)

    floors = {
        "hbm_bw_bytes_per_s": HBM_BW,
        "assemble_schur": {
            "dma_bytes": asm_bytes_schur,
            "dma_mb": mb(asm_bytes_schur),
            "dma_floor_ms": round(asm_bytes_schur / HBM_BW * 1e3, 3),
        },
        "assemble_noschur": {
            "dma_bytes": asm_bytes,
            "dma_mb": mb(asm_bytes),
            "dma_floor_ms": round(asm_bytes / HBM_BW * 1e3, 3),
        },
        "cost": {
            "dma_bytes": cost_bytes,
            "dma_mb": mb(cost_bytes),
            "dma_floor_ms": round(cost_bytes / HBM_BW * 1e3, 3),
        },
    }
    print(json.dumps(floors, indent=1))

    artifact = {
        "config": {
            "poses": NUM_POSES, "points": NUM_POINTS, "slots": Kp,
            "cams": C, "block_points": bm, "window": P,
            "padded_points": Mp, "num_blocks": nblocks, "calls": CALLS,
        },
        "measured_ms_per_call": results,
        "floors": floors,
    }
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "assemble_cost_roofline.json"), "w") as f:
        json.dump(artifact, f, indent=1)
    print("wrote", os.path.join(here, "assemble_cost_roofline.json"))


if __name__ == "__main__":
    main()
