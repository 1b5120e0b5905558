"""Pallas TPU kernels for the point-major full-BA engine.

Three kernels over the point-major layout (models/layout.py):

  * `assemble_pm`   -- one fused pass per LM iteration: windowed one-hot MXU
    gather of pose rows -> warp -> project -> residual -> Manhattan-Huber
    weight -> analytic Jacobians -> damped point blocks C/b/Cinv (free
    axis reductions) + per-slot coupling blocks U + pose-system partials
    (A, a) scattered through a windowed one-hot MXU matmul into per-block
    (P, 40) panels (finished by a tiny second-level segment-sum in XLA).
  * `schur_matvec_pm` -- the S @ x product for block-PCG: windowed one-hot
    gather of x, per-lane U^T x -> t, v = Cinv t, U v, windowed one-hot
    scatter back to (P, 8) panels; also emits t for back-substitution.
  * `cost_pm`       -- residual-only pass reducing the reference cost metric
    (sum of residual L2 norms, full cpp:427), the robust squared cost, the
    raw squared error, and the valid count to per-block partials.

Why this shape: XLA's per-observation scatter/gather costs ~6 ns / ~1.6 ns a
row on v5e, making the observation-table path scatter-bound (~860 ms per LM
iteration at 2.4M observations). Here the pose table lives in VMEM, the
point axis is the 128-wide lane axis, and every pose-side gather/scatter is
an (P, bm)x(bm, k) matmul on the MXU -- the TPU-native analogue of the
reference's AVX SoA warper (utility/simd_library.cpp:36-137), fused through
the entire Jacobian/Hessian pipeline instead of stopping at the warp.

Precision strategy for the one-hot MXU dots: the pose-row gather stays
HIGHEST (exact f32 -- rounding gathered pose values through bf16 costs a
~50x worse convergence floor, 0.04 px), while the A/a scatter and the whole
CG-matvec path use hi/lo bf16-pair dots (2 MXU passes, ~2^-16 relative,
~1.7x faster end-to-end): Hessian/gradient panels and the CG operator
tolerate a 1e-5 relative perturbation because LM's costs are evaluated
exactly and the gradient error stays relative as it vanishes at the
optimum.

Symmetric 3x3 component order: [xx, xy, xz, yy, yz, zz] (diag at 0, 3, 5).
U (pose 6 x point 3) component order: row-major e = a * 3 + c.
Cb plane rows: [0:6) damped C, [6:9) b, [9:15) Cinv, 15 slot-use count.
A-panel columns: [0:21) upper-tri A, [21:27) a, [27:33) B Cinv b (the
reduced-rhs correction, fused into the assembly scatter), [33:54) the
upper-tri Schur-diagonal correction sum_i B_ji Cinv_i B_ji^T (the
Schur-Jacobi preconditioner by-product -- exact because each pose-slot of a
landmark is a unique (pose, landmark) pair, models/layout.py), rest padding.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...models.layout import PMShape, PointMajorProblem

_HI = jax.lax.Precision.HIGHEST

A_COLS = 40  # 21 upper-tri A + 6 gradient a + 6 rhs-corr (B Cinv b), padded
# With emit_schur=True the panel widens to carry the 21 upper-tri
# Schur-diagonal correction columns too (the Schur-Jacobi preconditioner
# by-product; measured +0.9 ms/LM-iter of scatter at the 10k/1M flagship,
# so it is emitted only when Options.cg_precond requests it).
A_COLS_SCHUR = 64
COST_COLS = 8  # [sum ||r||, sum w r^2, sum r^2, valid count]

# Upper-triangle (a <= b) index pairs for the 6x6 pose block, row-major.
_TRI6 = [(a, b) for a in range(6) for b in range(a, 6)]

# Pose-window chunk: one-hot operands are materialized (CHUNK, Kp*bm) at a
# time so VMEM stays bounded for wide windows (P up to max_window); for the
# common local case (P <= 256) this is a single iteration and identical to
# the unchunked kernel.
_WINDOW_CHUNK = 256

# Pose/x tables are (rows, 16|8) arrays whose narrow lane dim pads to 128 in
# VMEM (8-16x bloat): a 50k-pose table would need ~25 MB of the ~16 MB VMEM.
# Above this row count the tables stay in HBM (memory_space ANY) and each
# block DMAs only its own (P, width) window into scratch.
_TABLE_VMEM_ROWS = 12288


def _table_is_big(rows: int) -> bool:
    return rows > _TABLE_VMEM_ROWS


def _window_pipeline(tbl_ref, base_ref, i, G, P, scratch_ref, sem):
    """Double-buffered big-mode window DMA: returns step i's (G*P, 128)
    pose/x window slab from `scratch_ref` ((2, G*P, 128) VMEM) without a
    serial DMA wait on the critical path.

    The ungrouped design started this step's G window copies and waited
    before the gather -- a per-grid-step DMA-latency stall that dominates
    the big-table mode's gap to its DMA floor (~2.4x floor at 50k/5M vs
    the VMEM mode's 1.2x; PERF.md round 5). Here step i's copies were
    issued at step i-1 (step 0 warms up its own), and step i+1's are
    issued into the other buffer BEFORE waiting, so they overlap this
    step's compute. Grid steps run sequentially on the core and scratch
    persists across them, so buffer (i%2) is never in flight when step i
    reads it. `base_ref` is scalar-prefetched: step i+1's bases are
    available at step i."""
    nsteps = pl.num_programs(0)
    buf = jax.lax.rem(i, 2)

    def copies(step, b):
        return [
            pltpu.make_async_copy(
                tbl_ref.at[pl.ds(base_ref[step * G + g_], P)],
                scratch_ref.at[b, pl.ds(g_ * P, P)],
                sem.at[b],
            )
            for g_ in range(G)
        ]

    @pl.when(i == 0)
    def _():
        for cp in copies(0, 0):
            cp.start()

    @pl.when(i + 1 < nsteps)
    def _():
        for cp in copies(i + 1, 1 - buf):
            cp.start()

    # Waits match the copies issued for THIS step (same byte counts; the
    # semaphore slot is per-buffer, so the just-started next-step copies
    # signal the other slot).
    for cp in copies(i, buf):
        cp.wait()
    return scratch_ref[buf]


def _gather_window(tbl_ref, base, P, idx, width):
    """Chunked windowed one-hot gather: sum over window chunks of
    tbl[base + c0 : base + c0 + CH]^T @ onehot(idx - base - c0).
    idx: (Kp, bm) table offsets relative to `base`. Returns (width, Kp*bm).
    Exact f32 (HIGHEST dots): used for pose rows. The table may be wider
    than `width` (big-mode scratch slabs are 128-lane padded for DMA
    alignment); extra lanes are sliced off after the load."""
    ch = min(P, _WINDOW_CHUNK)
    out = None
    for c0 in range(0, P, ch):
        ohc = _onehot_flat(idx - c0, ch)
        slab = tbl_ref[pl.ds(base + c0, ch), :][:, :width]
        part = _gather_rows(slab, ohc, width)
        out = part if out is None else out + part
    return out


def _scatter_window_hilo_fused(pan_ref, P, idx, contrib):
    """`_scatter_window_hilo` with the (hi, lo) passes fused into ONE dot:
    the two (cols, Kp*bm) operands concatenate along the non-contracting
    dim, so the MXU output tile is (ch, 2*cols) instead of two (ch, cols)
    halves -- at cols = 40|64 that doubles the systolic array's output-
    column utilization (the scatter's measured cost is ~10x its MAC floor
    purely from the skinny output tile; see
    benchmarks/assemble_cost_roofline.py)."""
    ch = min(P, _WINDOW_CHUNK)
    cols = contrib.shape[0]
    hi, lo = _split_hilo(contrib)
    both = jnp.concatenate([hi, lo], axis=0)  # (2*cols, Kp*bm)
    dn = (((1,), (1,)), ((), ()))
    for c0 in range(0, P, ch):
        oh = _onehot_flat(idx - c0, ch, jnp.bfloat16)
        out = jax.lax.dot_general(
            oh, both, dn, preferred_element_type=jnp.float32
        )  # (ch, 2*cols)
        pan_ref[0, c0 : c0 + ch, :] = out[:, :cols] + out[:, cols:]


def _scatter_window_hilo(pan_ref, P, idx, contrib):
    """Chunked hi/lo one-hot scatter into pan_ref[0] (P, cols): each chunk
    owns disjoint window rows, so chunks write (not accumulate)."""
    ch = min(P, _WINDOW_CHUNK)
    hi, lo = _split_hilo(contrib)
    dn = (((1,), (1,)), ((), ()))
    for c0 in range(0, P, ch):
        ohc = _onehot_flat(idx - c0, ch, jnp.bfloat16)
        pan_ref[0, c0 : c0 + ch, :] = (
            jax.lax.dot_general(ohc, hi, dn, preferred_element_type=jnp.float32)
            + jax.lax.dot_general(ohc, lo, dn, preferred_element_type=jnp.float32)
        )


def _pick_group(nblocks: int, P: int) -> int:
    """Blocks per grid step. G > 1 batches G consecutive landmark blocks
    into ONE grid step with a block-diagonal one-hot, so the windowed
    gather contracts over G*P systolic rows (vs P = 24 of 128) and the
    windowed scatter's output tile grows to (G*P, cols) rows.

    Grouping requires G*P <= _WINDOW_CHUNK: the grouped gathers/scatters
    then run as a SINGLE chunk that exactly tiles the stacked window (a
    partial chunk would mis-tile -- e.g. P=160, G=2 gives GP=320 vs a 256
    chunk -- and the grouped scatter additionally needs whole-P chunks for
    its panel-row writes). Wide windows (G*P > chunk) gain nothing from
    grouping anyway -- P >= 128 already fills the MXU contraction -- so
    they take the proven ungrouped path with its sub-window chunking.

    Default G = 2: the measured flagship sweet spot (10k/1M, v5e, 20-iter
    xplane A/B): the device LM iteration drops 16.82 -> 13.73 ms (matvec
    1.73 -> 1.41 ms/call, cost 1.69 -> 1.59, assemble 4.42 with the fused
    scatter). G = 4 OVERSHOOTS: 18.0 ms/iter (matvec 2.05, cost 2.24) --
    the 4x-larger one-hot operand materialization costs more than the
    tile-utilization gain returns. BA_PM_GROUP overrides for
    hardware/shape studies (the layout builders read the same target and
    pad num_blocks to a multiple of it -- solvers/full_ba_pm._group_target
    -- so the configured G divides; BUILD the layout under the same
    setting); it is read at TRACE time, so an in-process
    sweep must clear_cache() the jitted kernel wrappers between settings
    (same caveat as _TABLE_VMEM_ROWS -- see tests/test_full_ba_pm.py).
    PERF.md round 5 has the full table."""
    import os

    target = int(os.environ.get("BA_PM_GROUP", "2"))
    for g in (4, 2):
        if g <= target and nblocks % g == 0 and g * P <= _WINDOW_CHUNK:
            return g
    return 1


def _group_idx(slot_vals, base_ref, i, G, P, bm):
    """Combined-window offsets for a G-block group.

    slot_vals: (Kp, G*bm) absolute table rows (slot_pose) or opt rows
    (slot_opt). Lane l belongs to sub-block g = l // bm with window base
    base_ref[i*G + g]; its combined offset is local + g*P when the local
    offset lies in [0, P), else -1 (no one-hot match). The range guard is
    REQUIRED for G > 1: an out-of-window local offset (padded slot,
    sentinel -1 - sbase) could otherwise alias ANOTHER sub-block's row
    range."""
    Kp, W = slot_vals.shape
    lane_g = jax.lax.broadcasted_iota(jnp.int32, (Kp, W), 1) // bm
    base = jnp.zeros((Kp, W), jnp.int32)
    for g in range(G):
        base = jnp.where(lane_g == g, base_ref[i * G + g], base)
    local = slot_vals - base
    ok = jnp.logical_and(local >= 0, local < P)
    return jnp.where(ok, local + lane_g * P, -1)


def _group_window_rows(tbl, tbase, base_ref, i, G, P, width):
    """(G*P, width) stacked window rows for a G-block group (VMEM table
    mode; big mode DMAs the same layout into scratch directly)."""
    return jnp.concatenate(
        [
            tbl[pl.ds(tbase + base_ref[i * G + g], P), :][:, :width]
            for g in range(G)
        ],
        axis=0,
    )


def _gather_grouped(win, GP, idx, width, hilo=False):
    """Chunked one-hot gather over a stacked (GP, width) window.

    The chunk always tiles GP: for G > 1 the _pick_group gate guarantees
    GP <= _WINDOW_CHUNK (single chunk); for G = 1 (the big-mode path) a
    window wider than the chunk is rounded to a chunk multiple by the
    layout (models/layout.py window rounding)."""
    ch = min(GP, _WINDOW_CHUNK)
    out = None
    for c0 in range(0, GP, ch):
        if hilo:
            ohc = _onehot_flat(idx - c0, ch, jnp.bfloat16)
            part = _gather_rows_hilo(win[c0 : c0 + ch, :], ohc, width)
        else:
            ohc = _onehot_flat(idx - c0, ch)
            part = _gather_rows(win[c0 : c0 + ch, :], ohc, width)
        out = part if out is None else out + part
    return out


def _scatter_grouped_fused(pan_ref, G, P, idx, contrib):
    """Grouped fused hi/lo one-hot scatter into pan_ref (G, P, cols).

    Output rows are the stacked windows of the G sub-blocks ((G*P, cols)
    per grid step vs (P, cols) ungrouped). One chunk covering the whole
    stacked window: the _pick_group gate guarantees G*P <= _WINDOW_CHUNK
    for G > 1, and whole-P chunks are required for the panel-row writes."""
    GP = G * P
    cols = contrib.shape[0]
    hi, lo = _split_hilo(contrib)
    both = jnp.concatenate([hi, lo], axis=0)
    dn = (((1,), (1,)), ((), ()))
    oh = _onehot_flat(idx, GP, jnp.bfloat16)
    out = jax.lax.dot_general(
        oh, both, dn, preferred_element_type=jnp.float32
    )  # (GP, 2*cols)
    pan_ref[...] = (out[:, :cols] + out[:, cols:]).reshape(G, P, cols)


def _onehot_flat(idx, P, dtype=jnp.float32):
    """(P, K*bm) flattened one-hot of (K, bm) offsets -- one wide matmul
    operand instead of K narrow ones (tiny MXU dots are latency-bound:
    batching K=8 (P, bm) dots into one (P, K*bm) dot cut the matvec kernel
    ~2x on v5e). 0/1 are exact in any float dtype."""
    K, bm = idx.shape
    flat = idx.reshape(1, K * bm)
    iota = jax.lax.broadcasted_iota(jnp.int32, (P, K * bm), 0)
    return (iota == flat).astype(dtype)


def _gather_rows(tbl_win, oh, width):
    """(width, ...) = tbl_win^T @ oh, contracting the window axis.

    tbl_win: (P, width) f32; oh: (P, bm) one-hot; returns (width, bm).
    """
    return jax.lax.dot_general(
        tbl_win,
        oh,
        (((0,), (0,)), ((), ())),
        precision=_HI,
        preferred_element_type=jnp.float32,
    )


def _split_hilo(x):
    """f32 -> (hi, lo) bf16 pair with hi + lo == x to ~2^-16 relative."""
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _gather_rows_hilo(tbl_win, oh_bf, width):
    """hi/lo-split gather: 2 bf16 MXU passes instead of HIGHEST's 3+,
    exact to ~2^-16 relative (one-hot is exactly representable in bf16).
    Used on the CG matvec path where a 1e-5 operator perturbation is far
    below the block-Jacobi PCG's convergence floor."""
    hi, lo = _split_hilo(tbl_win)
    dn = (((0,), (0,)), ((), ()))
    return (
        jax.lax.dot_general(hi, oh_bf, dn, preferred_element_type=jnp.float32)
        + jax.lax.dot_general(lo, oh_bf, dn, preferred_element_type=jnp.float32)
    )


def _warp_and_project(shape: PMShape, g, X_blk, obs_blk, cam_ref, huber):
    """Shared residual-pass math on (Kp, bm) component arrays.

    g: (16, Kp, bm) gathered pose rows [r00..r22, tx, ty, tz, pad].
    Returns per-(cam, slot) lists of residual/weight/Jacobian components and
    the slot-level reference-frame point coordinates.
    """
    Kp, C = shape.slots, shape.cams
    r = [g[i] for i in range(9)]  # row-major R_jw components, (Kp, bm)
    t = [g[9 + i] for i in range(3)]
    x = X_blk[0:1, :]  # (1, bm) broadcasts over Kp
    y = X_blk[1:2, :]
    z = X_blk[2:3, :]

    # World -> rig reference frame (full cpp:744-745).
    xr = r[0] * x + r[1] * y + r[2] * z + t[0]
    yr = r[3] * x + r[4] * y + r[5] * z + t[1]
    zr = r[6] * x + r[7] * y + r[8] * z + t[2]

    KC = Kp * C
    per_cam = []
    for c in range(C):
        fx = cam_ref[c, 0]
        fy = cam_ref[c, 1]
        cx = cam_ref[c, 2]
        cy = cam_ref[c, 3]
        rc = [cam_ref[c, 4 + i] for i in range(9)]
        tc = [cam_ref[c, 13 + i] for i in range(3)]

        # Rig reference -> camera frame (full cpp:746-747).
        xc = rc[0] * xr + rc[1] * yr + rc[2] * zr + tc[0]
        yc = rc[3] * xr + rc[4] * yr + rc[5] * zr + tc[1]
        zc = rc[6] * xr + rc[7] * yr + rc[8] * zr + tc[2]

        pix_u = obs_blk[c * Kp : (c + 1) * Kp, :]
        pix_v = obs_blk[KC + c * Kp : KC + (c + 1) * Kp, :]
        valid = obs_blk[2 * KC + c * Kp : 2 * KC + (c + 1) * Kp, :]

        # Guard padded slots (gathered zeros give zc == 0).
        zsafe = jnp.where(jnp.abs(zc) > 1e-12, zc, 1.0)
        inv_z = 1.0 / zsafe
        ru = fx * xc * inv_z + cx - pix_u
        rv = fy * yc * inv_z + cy - pix_v
        man = jnp.abs(ru) + jnp.abs(rv)
        w = jnp.where(man > huber, huber / jnp.maximum(man, 1e-30), 1.0) * valid
        per_cam.append(
            dict(
                xc=xc, yc=yc, inv_z=inv_z, ru=ru, rv=rv, w=w, valid=valid,
                fx=fx, fy=fy, rc=rc,
            )
        )
    return per_cam, (xr, yr, zr)


def _jacobians(cam, lever):
    """Analytic Q (pose, 6) and Rj (point, 3) rows for one camera.

    Returns (Qu, Qv, Rju, Rjv): lists of 6/6/3/3 (Kp, bm) arrays.
    Mirrors full cpp:770-828 (projection Jacobian zero pattern, the
    [J_p | -J_p [X_ref]_x] pose block, Rj = J_p R_jw).
    """
    xr, yr, zr, Rjw = lever
    fx, fy, rc = cam["fx"], cam["fy"], cam["rc"]
    inv_z, xc, yc = cam["inv_z"], cam["xc"], cam["yc"]

    fx_iz = fx * inv_z
    fy_iz = fy * inv_z
    du_dz = -fx_iz * xc * inv_z
    dv_dz = -fy_iz * yc * inv_z
    # J_p rows through the rig extrinsic rotation (2x3), (Kp, bm) each.
    ju = [fx_iz * rc[0 + i] + du_dz * rc[6 + i] for i in range(3)]
    jv = [fy_iz * rc[3 + i] + dv_dz * rc[6 + i] for i in range(3)]

    # Rotation columns: J_p @ (-[X_ref]_x).
    qu_rot = [
        ju[2] * yr - ju[1] * zr,
        ju[0] * zr - ju[2] * xr,
        ju[1] * xr - ju[0] * yr,
    ]
    qv_rot = [
        jv[2] * yr - jv[1] * zr,
        jv[0] * zr - jv[2] * xr,
        jv[1] * xr - jv[0] * yr,
    ]
    Qu = ju + qu_rot
    Qv = jv + qv_rot
    # Rj = J_p @ R_jw: Rj[c] = sum_k J_p[k] R_jw[k, c].
    Rju = [
        ju[0] * Rjw[0 + c] + ju[1] * Rjw[3 + c] + ju[2] * Rjw[6 + c]
        for c in range(3)
    ]
    Rjv = [
        jv[0] * Rjw[0 + c] + jv[1] * Rjw[3 + c] + jv[2] * Rjw[6 + c]
        for c in range(3)
    ]
    return Qu, Qv, Rju, Rjv


def _inverse_sym3(c, det_floor=1e-30):
    """Closed-form inverse of a symmetric 3x3 given as 6 (..., bm) comps
    [xx, xy, xz, yy, yz, zz]; returns 6 comps, zeros when singular."""
    a, b_, c_, d, e, f = c[0], c[1], c[2], c[3], c[4], c[5]
    co00 = d * f - e * e
    co01 = c_ * e - b_ * f
    co02 = b_ * e - c_ * d
    det = a * co00 + b_ * co01 + c_ * co02
    inv_det = jnp.where(det > det_floor, 1.0 / jnp.where(det > det_floor, det, 1.0), 0.0)
    i00 = co00 * inv_det
    i01 = co01 * inv_det
    i02 = co02 * inv_det
    i11 = (a * f - c_ * c_) * inv_det
    i12 = (b_ * c_ - a * e) * inv_det
    i22 = (a * d - b_ * b_) * inv_det
    return [i00, i01, i02, i11, i12, i22]


def _assemble_kernel(shape: PMShape, big: bool, emit_schur: bool, G: int,
                     gbase_ref, sbase_ref, pose_tbl_ref, cam_ref, scal_ref,
                     obs_ref, spose_ref, sopt_ref, X_ref, U_ref, Cb_ref,
                     Apan_ref, scratch_ref=None, sem=None):
    Kp, C, bm0, P = shape.slots, shape.cams, shape.block_points, shape.window
    bm = bm0 * G  # effective lane width: G landmark blocks per grid step
    i = pl.program_id(0)
    lam = scal_ref[0, 0]
    huber = scal_ref[0, 1]

    # Windowed one-hot gather of pose rows: wide MXU dots, chunked over the
    # window so VMEM stays bounded; pose values must stay exact f32. G > 1
    # stacks the G sub-blocks' windows block-diagonally so the dot
    # contracts over G*P systolic rows (see _pick_group).
    if big:
        # Large-N: the pose table lives in HBM; windows arrive through the
        # double-buffered pipeline (issued one grid step ahead).
        if G == 1:
            idx_g = spose_ref[:] - gbase_ref[i]  # (Kp, bm)
        else:
            idx_g = _group_idx(spose_ref[:], gbase_ref, i, G, P, bm0)
        win = _window_pipeline(
            pose_tbl_ref, gbase_ref, i, G, P, scratch_ref, sem
        )[:, :16]
        g = _gather_grouped(win, G * P, idx_g, 16).reshape(16, Kp, bm)
    elif G == 1:
        idx_g = spose_ref[:] - gbase_ref[i]
        g = _gather_window(
            pose_tbl_ref, gbase_ref[i], P, idx_g, 16
        ).reshape(16, Kp, bm)
    else:
        idx_g = _group_idx(spose_ref[:], gbase_ref, i, G, P, bm0)
        win = _group_window_rows(pose_tbl_ref, 0, gbase_ref, i, G, P, 16)
        g = _gather_grouped(win, G * P, idx_g, 16).reshape(16, Kp, bm)

    X_blk = X_ref[:]  # (4, bm)
    pmask = X_blk[3:4, :]  # (1, bm) 1.0 for optimizable landmarks
    per_cam, (xr, yr, zr) = _warp_and_project(
        shape, g, X_blk, obs_ref[:], cam_ref, huber
    )
    Rjw = [g[i_] for i_ in range(9)]

    # Accumulators.
    Csym = [jnp.zeros((1, bm), jnp.float32) for _ in range(6)]
    bvec = [jnp.zeros((1, bm), jnp.float32) for _ in range(3)]
    Ue = [jnp.zeros((Kp, bm), jnp.float32) for _ in range(18)]
    Atri = [jnp.zeros((Kp, bm), jnp.float32) for _ in range(21)]
    avec = [jnp.zeros((Kp, bm), jnp.float32) for _ in range(6)]
    slot_use = jnp.zeros((Kp, bm), jnp.float32)

    for c in range(C):
        cam = per_cam[c]
        w, ru, rv = cam["w"], cam["ru"], cam["rv"]
        Qu, Qv, Rju, Rjv = _jacobians(cam, (xr, yr, zr, Rjw))
        slot_use = jnp.maximum(slot_use, cam["valid"])

        # Point block C += w (Rju Rju^T + Rjv Rjv^T), gradient b -= w Rj^T r
        # (full cpp:812-823), reduced over slots.
        for n_, (a_, b2) in enumerate([(0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2)]):
            contrib = w * (Rju[a_] * Rju[b2] + Rjv[a_] * Rjv[b2])
            Csym[n_] = Csym[n_] + jnp.sum(contrib, axis=0, keepdims=True)
        for a_ in range(3):
            contrib = -w * (Rju[a_] * ru + Rjv[a_] * rv)
            bvec[a_] = bvec[a_] + jnp.sum(contrib, axis=0, keepdims=True)

        # Coupling U += w Q^T Rj (accumulated over cameras; the reference
        # overwrites -- deliberate fix, see ops/hessian.py docstring).
        for a_ in range(6):
            for b2 in range(3):
                Ue[a_ * 3 + b2] = Ue[a_ * 3 + b2] + w * (
                    Qu[a_] * Rju[b2] + Qv[a_] * Rjv[b2]
                )

        # Pose block A += w Q^T Q (upper-tri), a -= w Q^T r (cpp:795-809).
        for n_, (a_, b2) in enumerate(_TRI6):
            Atri[n_] = Atri[n_] + w * (Qu[a_] * Qu[b2] + Qv[a_] * Qv[b2])
        for a_ in range(6):
            avec[a_] = avec[a_] - w * (Qu[a_] * ru + Qv[a_] * rv)

    # Damped point blocks + closed-form inverse; fixed landmarks (pmask == 0)
    # zero out C -> Cinv = 0 -> they drop out of the Schur system.
    damp = 1.0 + lam
    Cd = [Csym[n_] * pmask for n_ in range(6)]
    Cd[0] = Cd[0] * damp
    Cd[3] = Cd[3] * damp
    Cd[5] = Cd[5] * damp
    Cinv = _inverse_sym3(Cd)
    for n_ in range(6):
        Cb_ref[n_ : n_ + 1, :] = Cd[n_]
        Cb_ref[9 + n_ : 10 + n_, :] = Cinv[n_]
    for a_ in range(3):
        Cb_ref[6 + a_ : 7 + a_, :] = bvec[a_] * pmask
    Cb_ref[15:16, :] = jnp.sum(slot_use, axis=0, keepdims=True)

    # U planes, masked so fixed landmarks never couple. Stored in the
    # configured coupling dtype: bf16 halves the dominant DMA of the CG
    # matvec (the ~0.4% step-direction perturbation is benign for an
    # inexact-Newton trust region -- costs and gradients stay f32).
    for e in range(18):
        U_ref[e] = (Ue[e] * pmask).astype(U_ref.dtype)

    # Reduced-rhs correction B Cinv b, fused here where U and Cinv b are
    # already in registers (saves a separate kernel + U re-read per LM
    # iteration). v = Cinv (b * pmask); w_slot = U v per slot.
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

    # Schur-Jacobi preconditioner by-product (emit_schur only): per-slot
    # U Cinv U^T, the landmark-sum of which is EXACTLY the Schur-diagonal
    # correction sum_i B_ji Cinv_i B_ji^T for pose j, because each slot is
    # a unique (pose, landmark) pair (models/layout.py groups a pair's rig
    # cameras into one slot). Fused here where U and Cinv are already in
    # registers: a separate pass would re-read the 18 U planes -- the
    # dominant DMA. Only 3 W planes (row a of U Cinv) are live at a time.
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

    # Pose-system panel: windowed one-hot MXU scatter, chunked over P.
    # Columns [0:21) upper-tri A, [21:27) gradient a, [27:33) B Cinv b,
    # [33:54) upper-tri Schur-diagonal correction (emit_schur only).
    cols = A_COLS_SCHUR if emit_schur else A_COLS
    used = 33 + len(schur_rows)
    contrib = jnp.concatenate(
        [Atri[n_].reshape(1, Kp * bm) for n_ in range(21)]
        + [avec[a_].reshape(1, Kp * bm) for a_ in range(6)]
        + [rhs_rows[a_].reshape(1, Kp * bm) for a_ in range(6)]
        + [schur_rows[n_].reshape(1, Kp * bm) for n_ in range(len(schur_rows))]
        + [jnp.zeros((cols - used, Kp * bm), jnp.float32)],
        axis=0,
    )  # (cols, Kp*bm)
    if G == 1:
        # fixed/pad slots give -1 - sbase: out of [0, P), no one-hot match.
        idx_s = sopt_ref[:] - sbase_ref[i]
        _scatter_window_hilo_fused(Apan_ref, P, idx_s, contrib)
    else:
        idx_s = _group_idx(sopt_ref[:], sbase_ref, i, G, P, bm0)
        _scatter_grouped_fused(Apan_ref, G, P, idx_s, contrib)


def _matvec_kernel(shape: PMShape, mode: str, big: bool, G: int, sbase_ref,
                   x_tbl_ref, U_ref, Cb_ref, sopt_ref, out_pan_ref, t_ref,
                   scratch_ref=None, sem=None):
    Kp, bm0, P = shape.slots, shape.block_points, shape.window
    bm = bm0 * G  # effective lane width: G landmark blocks per grid step
    GP = G * P
    i = pl.program_id(0)
    if G == 1:
        idx_s = sopt_ref[:] - sbase_ref[i]  # (Kp, bm)
    else:
        idx_s = _group_idx(sopt_ref[:], sbase_ref, i, G, P, bm0)

    # One-hot chunks built ONCE and shared by the gather and the scatter
    # (their dots contract the same (chunk, Kp*bm) operand on opposite
    # sides); building it twice paid the iota+compare cost twice. For
    # G > 1 a single chunk covers the stacked window (the _pick_group gate
    # guarantees GP <= _WINDOW_CHUNK, and the grouped scatter needs
    # whole-P chunks for its panel-row writes); for G = 1 the chunk bound
    # keeps wide-window one-hots VMEM-sized (layout rounds P > chunk to a
    # chunk multiple, so chunks tile the window).
    ch = GP if G > 1 else min(P, _WINDOW_CHUNK)
    ohs = [
        (c0, _onehot_flat(idx_s - c0, ch, jnp.bfloat16))
        for c0 in range(0, GP, ch)
    ]

    # Full-sublane (Kp, bm) planes, upcast once from the storage dtype.
    U = [U_ref[e].astype(jnp.float32) for e in range(18)]

    if mode == "rhs":
        # t := b (the per-landmark gradient) so the scatter below produces
        # the B Cinv b correction of the reduced rhs (cpp:887-888).
        t = [Cb_ref[6 + cpt : 7 + cpt, :] for cpt in range(3)]
    else:
        # Gather x at every slot's pose in wide chunked dots (fixed slots
        # gather zeros), then t = sum_slots U^T x (pass 1 of the S matvec);
        # all element math runs on full-sublane (Kp, bm) planes.
        if big:
            # Windows arrive through the double-buffered DMA pipeline
            # (issued one grid step ahead; see _window_pipeline).
            win = _window_pipeline(
                x_tbl_ref, sbase_ref, i, G, P, scratch_ref, sem
            )[:, :8]
        elif G == 1:
            win = x_tbl_ref[pl.ds(sbase_ref[i], P), :][:, :8]
        else:
            win = _group_window_rows(x_tbl_ref, 0, sbase_ref, i, G, P, 8)
        xg = None
        for c0, oh in ohs:
            part = _gather_rows_hilo(win[c0 : c0 + ch, :], oh, 8)
            xg = part if xg is None else xg + part
        xg_all = xg.reshape(8, Kp, bm)
        t = []
        for cpt in range(3):
            acc = U[cpt] * xg_all[0]
            for a_ in range(1, 6):
                acc = acc + U[a_ * 3 + cpt] * xg_all[a_]
            t.append(jnp.sum(acc, axis=0, keepdims=True))  # (1, bm)

    for cpt in range(3):
        t_ref[cpt : cpt + 1, :] = t[cpt]
    t_ref[3:4, :] = jnp.zeros((1, bm), jnp.float32)

    # v = Cinv t.
    ci = [Cb_ref[9 + n_ : 10 + n_, :] for n_ in range(6)]
    v0 = ci[0] * t[0] + ci[1] * t[1] + ci[2] * t[2]
    v1 = ci[1] * t[0] + ci[3] * t[1] + ci[4] * t[2]
    v2 = ci[2] * t[0] + ci[4] * t[1] + ci[5] * t[2]

    # w_slot = U v ((1, bm) v broadcasts over the Kp sublanes), scattered
    # back to the pose panel in one fused hi/lo dot per chunk (the (hi, lo)
    # operands concatenate along the output dim -- same trick as the
    # assembly scatter, doubling the skinny output tile's width).
    rows = []
    for a_ in range(6):
        row = U[a_ * 3] * v0 + U[a_ * 3 + 1] * v1 + U[a_ * 3 + 2] * v2
        rows.append(row.reshape(1, Kp * bm))
    rows.append(jnp.zeros((2, Kp * bm), jnp.float32))
    contrib = jnp.concatenate(rows, axis=0)  # (8, Kp*bm)
    hi, lo = _split_hilo(contrib)
    both = jnp.concatenate([hi, lo], axis=0)  # (16, Kp*bm)
    dn = (((1,), (1,)), ((), ()))
    for c0, oh in ohs:
        out = jax.lax.dot_general(
            oh, both, dn, preferred_element_type=jnp.float32
        )  # (ch, 16)
        res = out[:, :8] + out[:, 8:]
        if G == 1:
            out_pan_ref[0, c0 : c0 + ch, :] = res
        else:
            out_pan_ref[pl.ds(c0 // P, ch // P)] = res.reshape(
                ch // P, P, 8
            )


def _cost_kernel(shape: PMShape, big: bool, G: int, gbase_ref, pose_tbl_ref,
                 cam_ref, scal_ref, obs_ref, spose_ref, X_ref, cost_ref,
                 scratch_ref=None, sem=None):
    Kp, C, bm0, P = shape.slots, shape.cams, shape.block_points, shape.window
    bm = bm0 * G
    i = pl.program_id(0)
    huber = scal_ref[0, 1]

    if big:
        # Windows arrive through the double-buffered DMA pipeline
        # (issued one grid step ahead; see _window_pipeline).
        if G == 1:
            idx_g = spose_ref[:] - gbase_ref[i]
        else:
            idx_g = _group_idx(spose_ref[:], gbase_ref, i, G, P, bm0)
        win = _window_pipeline(
            pose_tbl_ref, gbase_ref, i, G, P, scratch_ref, sem
        )[:, :16]
        g = _gather_grouped(win, G * P, idx_g, 16).reshape(16, Kp, bm)
    elif G == 1:
        idx_g = spose_ref[:] - gbase_ref[i]
        g = _gather_window(
            pose_tbl_ref, gbase_ref[i], P, idx_g, 16
        ).reshape(16, Kp, bm)
    else:
        idx_g = _group_idx(spose_ref[:], gbase_ref, i, G, P, bm0)
        win = _group_window_rows(pose_tbl_ref, 0, gbase_ref, i, G, P, 16)
        g = _gather_grouped(win, G * P, idx_g, 16).reshape(16, Kp, bm)

    per_cam, _ = _warp_and_project(shape, g, X_ref[:], obs_ref[:], cam_ref, huber)
    s_norm = jnp.float32(0)
    s_wsq = jnp.float32(0)
    s_sq = jnp.float32(0)
    s_cnt = jnp.float32(0)
    for c in range(C):
        cam = per_cam[c]
        ru, rv, w, valid = cam["ru"], cam["rv"], cam["w"], cam["valid"]
        sq = ru * ru + rv * rv
        s_norm += jnp.sum(valid * jnp.sqrt(jnp.maximum(sq, 0.0)))
        s_wsq += jnp.sum(w * sq)
        s_sq += jnp.sum(valid * sq)
        s_cnt += jnp.sum(valid)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    row = (
        jnp.where(lane == 0, s_norm, 0.0)
        + jnp.where(lane == 1, s_wsq, 0.0)
        + jnp.where(lane == 2, s_sq, 0.0)
        + jnp.where(lane == 3, s_cnt, 0.0)
    )

    # Sequential-grid accumulation into one (1, 128) panel (TPU blocks must
    # be (8, 128)-aligned or dim-equal, so per-block rows are not writable).
    @pl.when(i == 0)
    def _():
        cost_ref[:] = row

    @pl.when(i > 0)
    def _():
        cost_ref[:] = cost_ref[:] + row


# ---------------------------------------------------------------------------
# Host-side wrappers (jit-safe; shape is a static arg)
# ---------------------------------------------------------------------------


def pose_table(R_cw, t_cw, P):
    """Pack (N, 3, 3) + (N, 3) into a zero-padded (N + P, 16) gather table.

    The point-major solvers CARRY this table across LM iterations (flat
    16-column rows tile cleanly as (8, 128) VMEM/HBM pages; (N, 3, 3)
    arrays tile as (4, 128) and every update on them pays layout copies),
    so per-iteration kernel calls take the table directly
    (assemble_pm_tbl / cost_pm_tbl)."""
    N = R_cw.shape[0]
    tbl = jnp.zeros((N + P, 16), jnp.float32)
    tbl = tbl.at[:N, :9].set(R_cw.reshape(N, 9))
    tbl = tbl.at[:N, 9:12].set(t_cw)
    return tbl


_pose_table = pose_table  # internal alias (pre-refactor name)


def _cam_table(rig):
    """(C, 16) camera table: [fx, fy, cx, cy, R(9), t(3)]."""
    C = rig.fx.shape[0]
    tbl = jnp.zeros((C, 16), jnp.float32)
    tbl = tbl.at[:, 0].set(rig.fx)
    tbl = tbl.at[:, 1].set(rig.fy)
    tbl = tbl.at[:, 2].set(rig.cx)
    tbl = tbl.at[:, 3].set(rig.cy)
    tbl = tbl.at[:, 4:13].set(rig.R_cam_from_ref.reshape(C, 9))
    tbl = tbl.at[:, 13:16].set(rig.t_cam_from_ref)
    return tbl


def _second_level(panels, sbase, n_opt, P, cols):
    """Finish a windowed scatter: (nblocks, P, cols) panels + per-block bases
    -> (n_opt, cols) via one small segment-sum.

    XLA's scatter-add costs ~7 ns per scattered ROW regardless of width
    (and an (r, cols<=128) operand lane-pads 16x), so the rows are grouped
    into 8-row tiles first: every sbase is 8-aligned and P is a multiple
    of 8 (models/layout.py), so block i's window covers whole tiles
    sbase_i/8 + j, j < P/8, and the tiled segment-sum scatters 8x fewer,
    8x wider rows -- same values added in the same block order (measured
    0.74 -> ~0.1 ms per flagship LM iteration on the CG-matvec side)."""
    nblocks = panels.shape[0]
    assert P % 8 == 0, "layout guarantees 8-aligned windows"
    tiles = panels.reshape(nblocks * (P // 8), 8 * cols)
    keys = (
        sbase[:, None] // 8 + jnp.arange(P // 8, dtype=jnp.int32)[None, :]
    ).reshape(-1)
    nseg = (n_opt + P + 7) // 8
    out = jax.ops.segment_sum(tiles, keys, num_segments=nseg)
    return out.reshape(nseg * 8, cols)[:n_opt]


def _tri_to_full(Atri):
    """(n, 21) upper-tri -> (n, 6, 6) symmetric."""
    n = Atri.shape[0]
    A = jnp.zeros((n, 6, 6), Atri.dtype)
    for n_, (a_, b_) in enumerate(_TRI6):
        A = A.at[:, a_, b_].set(Atri[:, n_])
        if a_ != b_:
            A = A.at[:, b_, a_].set(Atri[:, n_])
    return A


@functools.partial(
    jax.jit, static_argnames=("shape", "interpret", "u_dtype", "emit_schur")
)
def assemble_pm_tbl(pm: PointMajorProblem, shape: PMShape, pose_tbl,
                    X, rig, lam, huber, interpret: bool = False,
                    u_dtype: str = "float32",
                    emit_schur: bool = False):
    """`assemble_pm_partials` on a pre-packed (N + P, 16) pose table (the
    form the point-major solvers carry across LM iterations)."""
    Kp, C, bm, P = shape.slots, shape.cams, shape.block_points, shape.window
    Mp, nblocks = shape.padded_points, shape.num_blocks
    cols = A_COLS_SCHUR if emit_schur else A_COLS
    cam_tbl = _cam_table(rig)
    scal = jnp.stack([lam, jnp.asarray(huber, jnp.float32)]).reshape(1, 2)

    big = _table_is_big(pose_tbl.shape[0])
    if big:
        # HBM DMA slices must be 128-lane aligned (Mosaic tiling); pad.
        pose_tbl = jnp.pad(pose_tbl, ((0, 0), (0, 128 - pose_tbl.shape[1])))
    G = _pick_group(nblocks, shape.window)
    bmG = bm * G
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # gbase, sbase
        grid=(nblocks // G,),
        scratch_shapes=(
            [pltpu.VMEM((2, G * P, 128), jnp.float32),
             pltpu.SemaphoreType.DMA((2,))]
            if big
            else []
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY if big else pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # cam_tbl (C, 16)
            pl.BlockSpec(memory_space=pltpu.SMEM),  # scal (1, 2)
            pl.BlockSpec((3 * Kp * C, bmG), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),  # obs planes
            pl.BlockSpec((Kp, bmG), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),  # slot_pose
            pl.BlockSpec((Kp, bmG), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),  # slot_opt
            pl.BlockSpec((4, bmG), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),  # X
        ],
        out_specs=[
            pl.BlockSpec((18, Kp, bmG), lambda i, *_: (0, 0, i),
                         memory_space=pltpu.VMEM),  # U
            pl.BlockSpec((16, bmG), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),  # Cb
            pl.BlockSpec((G, P, cols), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),  # A panels
        ],
    )
    U, Cb, Apan = pl.pallas_call(
        functools.partial(_assemble_kernel, shape, big, emit_schur, G),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((18, Kp, Mp), jnp.dtype(u_dtype)),
            jax.ShapeDtypeStruct((16, Mp), jnp.float32),
            jax.ShapeDtypeStruct((nblocks, P, cols), jnp.float32),
        ],
        interpret=interpret,
    )(pm.gbase, pm.sbase, pose_tbl, cam_tbl, scal, pm.obs_f32, pm.slot_pose,
      pm.slot_opt, X)

    flat = _second_level(Apan, pm.sbase, shape.num_opt_poses, P, cols)
    return flat, Cb, U


@functools.partial(
    jax.jit, static_argnames=("shape", "interpret", "u_dtype", "emit_schur")
)
def assemble_pm_partials(pm: PointMajorProblem, shape: PMShape, R_cw, t_cw,
                         X, rig, lam, huber, interpret: bool = False,
                         u_dtype: str = "float32",
                         emit_schur: bool = False):
    """Run the fused assembly kernel, returning the pose system as flat
    per-shard partials (for a cross-shard reduction in distributed mode).

    Returns (flat, Cb, U):
      flat (n_opt, A_COLS or A_COLS_SCHUR): [0:21) undamped upper-tri A,
      [21:27) gradient a, [27:33) B Cinv b, and with emit_schur=True
      [33:54) the Schur-diagonal correction (schur_precond_tri input),
      Cb (16, Mp) point-block planes (damped, local to this shard's points),
      U (18, Kp, Mp) coupling planes in `u_dtype` ("bfloat16" halves the
      matvec's U traffic for DMA-bound problems at a slightly higher
      convergence floor; "float32" default).
    """
    return assemble_pm_tbl(
        pm, shape, pose_table(R_cw, t_cw, shape.window), X, rig, lam,
        huber, interpret=interpret, u_dtype=u_dtype, emit_schur=emit_schur,
    )


def finish_pose_system_tri(flat, lam):
    """Flat pose-system partials -> (damped Atri (n_opt, 21), a (n_opt, 6),
    rhs (n_opt, 6) = a - B Cinv b), staying in the flat layout (see
    ops/sym6.py -- materializing (n, 6, 6) costs ~7.5 ms/iteration in
    dynamic-update-slices on v5e). In distributed mode, psum `flat` over the
    data axis first."""
    from ...ops.sym6 import tri6_damp

    # (1 + lambda) diagonal damping on the pose blocks (cpp:838-846).
    a = flat[:, 21:27]
    rhs = a - flat[:, 27:33]
    return tri6_damp(flat[:, :21], lam), a, rhs


def schur_precond_tri(flat, lam):
    """Schur-Jacobi preconditioner blocks from the assembly partials:
    diag_j(S) = damped A_jj - sum_i B_ji Cinv_i B_ji^T, flat (n_opt, 21) tri
    layout (invert with ops/sym6.inverse_tri6).

    This is the standard BA preconditioner (the diagonal blocks of the exact
    reduced camera matrix S; cf. the block-Jacobi-on-A baseline it replaces,
    which ignores the Schur correction entirely). SPD for lam > 0: per
    (pose j, landmark i) pair, C_i >= the pair's own R^T R sub-block, so
    B_ji Cinv_i B_ji^T <= the pair's Q^T Q contribution to A_jj (Schur
    complement of the pair's PSD normal block); summing over i and adding
    the (1 + lam) damping keeps diag_j(S) positive definite. In distributed
    mode psum `flat` over the data axis first (landmark sums).
    """
    from ...ops.sym6 import tri6_damp

    if flat.shape[1] < 54:
        raise ValueError(
            "flat has no Schur-diagonal columns; call assemble_pm_partials "
            "with emit_schur=True"
        )
    return tri6_damp(flat[:, :21], lam) - flat[:, 33:54]


def finish_pose_system(flat, lam):
    """Flat pose-system partials -> (damped A (n_opt, 6, 6), a (n_opt, 6)).
    Materialized form, for parity tests and external consumers; the solvers
    use finish_pose_system_tri."""
    Atri, a, _ = finish_pose_system_tri(flat, lam)
    return _tri_to_full(Atri), a


def assemble_pm(pm: PointMajorProblem, shape: PMShape, R_cw, t_cw, X, rig,
                lam, huber, interpret: bool = False,
                u_dtype: str = "float32"):
    """Single-chip assembly: (A damped, a, Cb, U). Defaults to f32 coupling
    blocks for exact parity checks; solvers pass Options.coupling_dtype."""
    flat, Cb, U = assemble_pm_partials(
        pm, shape, R_cw, t_cw, X, rig, lam, huber, interpret=interpret,
        u_dtype=u_dtype,
    )
    A, a = finish_pose_system(flat, lam)
    return A, a, Cb, U


def _run_matvec(pm, shape: PMShape, Cb, U, x_tbl, mode: str, interpret: bool):
    Kp, bm, P = shape.slots, shape.block_points, shape.window
    Mp, nblocks = shape.padded_points, shape.num_blocks
    big = _table_is_big(x_tbl.shape[0])
    if big:
        x_tbl = jnp.pad(x_tbl, ((0, 0), (0, 128 - x_tbl.shape[1])))
    G = _pick_group(nblocks, shape.window)
    bmG = bm * G
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # sbase
        grid=(nblocks // G,),
        scratch_shapes=(
            [pltpu.VMEM((2, G * P, 128), jnp.float32),
             pltpu.SemaphoreType.DMA((2,))]
            if big
            else []
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY if big else pltpu.VMEM),
            pl.BlockSpec((18, Kp, bmG), lambda i, *_: (0, 0, i),
                         memory_space=pltpu.VMEM),  # U
            pl.BlockSpec((16, bmG), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),  # Cb
            pl.BlockSpec((Kp, bmG), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),  # slot_opt
        ],
        out_specs=[
            pl.BlockSpec((G, P, 8), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, bmG), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),
        ],
    )
    return pl.pallas_call(
        functools.partial(_matvec_kernel, shape, mode, big, G),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((nblocks, P, 8), jnp.float32),
            jax.ShapeDtypeStruct((4, Mp), jnp.float32),
        ],
        interpret=interpret,
    )(pm.sbase, x_tbl, U, Cb, pm.slot_opt)


@functools.partial(jax.jit, static_argnames=("shape", "interpret"))
def matvec_corr_pm(pm: PointMajorProblem, shape: PMShape, Cb, U, x,
                   interpret: bool = False):
    """The B Cinv B^T x correction of S @ x, as a per-shard partial (psum in
    distributed mode). Returns (corr (n_opt, 6), t (4, Mp)) where
    t = B^T x per landmark (used for back-substitution)."""
    n_opt = shape.num_opt_poses
    P = shape.window
    x_tbl = jnp.zeros((n_opt + P, 8), jnp.float32).at[:n_opt, :6].set(x)
    pan, t = _run_matvec(pm, shape, Cb, U, x_tbl, "matvec", interpret)
    corr = _second_level(pan, pm.sbase, n_opt, P, 8)[:, :6]
    return corr, t


@functools.partial(jax.jit, static_argnames=("shape", "interpret"))
def rhs_corr_pm(pm: PointMajorProblem, shape: PMShape, Cb, U,
                interpret: bool = False):
    """The B Cinv b correction of the reduced rhs, per-shard partial."""
    n_opt = shape.num_opt_poses
    P = shape.window
    x_tbl = jnp.zeros((n_opt + P, 8), jnp.float32)
    pan, _ = _run_matvec(pm, shape, Cb, U, x_tbl, "rhs", interpret)
    return _second_level(pan, pm.sbase, n_opt, P, 8)[:, :6]


def schur_matvec_pm(pm: PointMajorProblem, shape: PMShape, A, Cb, U, x,
                    interpret: bool = False):
    """S @ x for the single-chip PCG loop. x: (n_opt, 6). Returns
    (Sx (n_opt, 6), t (4, Mp))."""
    corr, t = matvec_corr_pm(pm, shape, Cb, U, x, interpret=interpret)
    Ax = jnp.einsum("jab,jb->ja", A, x, precision=_HI)
    return Ax - corr, t


def schur_rhs_pm(pm: PointMajorProblem, shape: PMShape, a, Cb, U,
                 interpret: bool = False):
    """Reduced rhs = a - B Cinv b, matrix-free (cpp:887-888)."""
    return a - rhs_corr_pm(pm, shape, Cb, U, interpret=interpret)


@functools.partial(jax.jit, static_argnames=("shape", "interpret"))
def cost_pm_tbl(pm: PointMajorProblem, shape: PMShape, pose_tbl, X, rig,
                huber, interpret: bool = False):
    """`cost_pm` on a pre-packed (N + P, 16) pose table."""
    Kp, C, bm, P = shape.slots, shape.cams, shape.block_points, shape.window
    nblocks = shape.num_blocks
    cam_tbl = _cam_table(rig)
    scal = jnp.stack(
        [jnp.asarray(0.0, jnp.float32), jnp.asarray(huber, jnp.float32)]
    ).reshape(1, 2)

    big = _table_is_big(pose_tbl.shape[0])
    if big:
        pose_tbl = jnp.pad(pose_tbl, ((0, 0), (0, 128 - pose_tbl.shape[1])))
    G = _pick_group(nblocks, shape.window)
    bmG = bm * G
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # gbase
        grid=(nblocks // G,),
        scratch_shapes=(
            [pltpu.VMEM((2, G * P, 128), jnp.float32),
             pltpu.SemaphoreType.DMA((2,))]
            if big
            else []
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY if big else pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # cam_tbl
            pl.BlockSpec(memory_space=pltpu.SMEM),  # scal
            pl.BlockSpec((3 * Kp * C, bmG), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Kp, bmG), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, bmG), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 128), lambda i, *_: (0, 0),
                               memory_space=pltpu.VMEM),
    )
    tot = pl.pallas_call(
        functools.partial(_cost_kernel, shape, big, G),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
        interpret=interpret,
    )(pm.gbase, pose_tbl, cam_tbl, scal, pm.obs_f32, pm.slot_pose, X)[0]
    return tot[0], tot[1], tot[2], tot[3]


def cost_pm(pm: PointMajorProblem, shape: PMShape, R_cw, t_cw, X, rig, huber,
            interpret: bool = False):
    """Residual-only cost pass. Returns (sum ||r||, sum w r^2, sum r^2,
    valid count) as f32 scalars (scaled pixel units)."""
    return cost_pm_tbl(
        pm, shape, pose_table(R_cw, t_cw, shape.window), X, rig, huber,
        interpret=interpret,
    )
