"""Pallas TPU kernel: fused pose-only Gauss-Newton statistics.

One pass over the point cloud produces everything a mono 6-DoF GN iteration
needs -- warp, project, residual, Manhattan-Huber weight, analytic Jacobian
rows, and the reductions JtWJ (6x6), Jtr (6), robust cost -- without ever
materializing the (P, 2, 6) Jacobian in HBM.

This is the speed-of-light version of the reference's per-iteration work
(pose_only_bundle_adjustment_solver.cpp:59-109 + the structured-sparsity
JtWJ kernels at cpp:907-1177): the jnp path writes ~48 B/point of Jacobian
to HBM and reads it back into the MXU contraction; this kernel reads
24 B/point (x, y, z, pu, pv, valid planes) and writes 28 scalars per 8k-point
tile. Arithmetic intensity goes from ~1 flop/byte to ~30.

Layout: plane (SoA) layout from ops/pallas/warp.py -- (rows, 128) f32 planes,
(8, 128)-aligned, the VPU-native shape.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .warp import LANE, SUBLANE

_TILE_ROWS = 64  # 8192 points per grid step

# Output scalar slots per tile: 21 (upper JtWJ) + 6 (Jtr) + 1 (cost) = 28.
_NUM_STATS = 28
_TRIU = [(i, j) for i in range(6) for j in range(i, 6)]


def _camera_stats(xc, yc, zc, pu, pv, fx, fy, cx, cy, valid, huber):
    """Per-camera GN statistics on (T, 128) planes already warped into the
    camera frame: the 28 tile-reduced scalars (21 upper JtWJ + 6 JtWr +
    robust cost). The Jacobian is taken w.r.t. a perturbation in THIS
    camera's frame (for stereo right this matches the reference's
    right-frame linearization, cpp:304-307)."""
    zc = jnp.where(valid > 0, zc, 1.0)  # padding-safe reciprocal

    inv_z = 1.0 / zc
    xiz = xc * inv_z
    yiz = yc * inv_z
    ru = fx * xiz + cx - pu
    rv = fy * yiz + cy - pv

    # Manhattan-Huber weight (cpp:1402-1410), zeroed on padding.
    man = jnp.abs(ru) + jnp.abs(rv)
    w = jnp.where(man > huber, huber / man, 1.0) * valid

    # Analytic Jacobian rows (cpp:1371-1383).
    fxiz = fx * inv_z
    fyiz = fy * inv_z
    ju = (
        fxiz,
        jnp.zeros_like(fxiz),
        -fxiz * xiz,
        -fx * xiz * yiz,
        fx * (1.0 + xiz * xiz),
        -fx * yiz,
    )
    jv = (
        jnp.zeros_like(fyiz),
        fyiz,
        -fyiz * yiz,
        -fy * (1.0 + yiz * yiz),
        fy * xiz * yiz,
        fy * xiz,
    )

    stats = []
    for a, b in _TRIU:  # 21 upper-triangle JtWJ entries
        stats.append(jnp.sum(w * (ju[a] * ju[b] + jv[a] * jv[b])))
    wru = w * ru
    wrv = w * rv
    for a in range(6):  # 6 gradient entries J^T W r
        stats.append(jnp.sum(wru * ju[a] + wrv * jv[a]))
    stats.append(jnp.sum(w * (ru * ru + rv * rv)))  # robust cost
    return stats


def _warp(rt_ref, x, y, z):
    """Apply the (3, 4) SMEM [R | t] to three coordinate planes."""
    xc = rt_ref[0, 0] * x + rt_ref[0, 1] * y + rt_ref[0, 2] * z + rt_ref[0, 3]
    yc = rt_ref[1, 0] * x + rt_ref[1, 1] * y + rt_ref[1, 2] * z + rt_ref[1, 3]
    zc = rt_ref[2, 0] * x + rt_ref[2, 1] * y + rt_ref[2, 2] * z + rt_ref[2, 3]
    return xc, yc, zc


def _write_stats(out_ref, stats):
    vec = jnp.stack(stats)
    out_ref[:] = jnp.zeros((SUBLANE, LANE), vec.dtype)
    out_ref[0, : _NUM_STATS] = vec


def _gn_kernel(
    rt_ref,  # (3, 4) SMEM: [R | t] of T_cw
    intr_ref,  # (1, 4) SMEM: fx, fy, cx, cy
    x_ref,
    y_ref,
    z_ref,  # (T, 128) point planes (reference frame)
    pu_ref,
    pv_ref,  # (T, 128) pixel planes
    valid_ref,  # (T, 128) 1.0 / 0.0
    out_ref,  # (1, 128) per-tile stats (first _NUM_STATS lanes)
    *,
    huber: float,
):
    xc, yc, zc = _warp(rt_ref, x_ref[:], y_ref[:], z_ref[:])
    stats = _camera_stats(
        xc, yc, zc, pu_ref[:], pv_ref[:],
        intr_ref[0, 0], intr_ref[0, 1], intr_ref[0, 2], intr_ref[0, 3],
        valid_ref[:], huber,
    )
    _write_stats(out_ref, stats)


def _gn_stereo_kernel(
    rt_ref,  # (3, 4) SMEM: [R | t] of T_cw (left)
    rt_rl_ref,  # (3, 4) SMEM: [R | t] of right<-left rig extrinsic
    intr_ref,  # (2, 4) SMEM: rows (fxl, fyl, cxl, cyl), (fxr, fyr, cxr, cyr)
    x_ref,
    y_ref,
    z_ref,  # (T, 128) point planes (reference frame)
    pul_ref,
    pvl_ref,  # (T, 128) left pixel planes
    vl_ref,  # (T, 128) left validity 1.0 / 0.0
    pur_ref,
    pvr_ref,  # (T, 128) right pixel planes
    vr_ref,  # (T, 128) right validity (0 where no right match, cpp:298)
    out_ref,
    *,
    huber: float,
):
    """Fused STEREO 6-DoF GN statistics (reference cpp:172-399): both
    cameras' contributions in one pass over the shared point planes -- the
    left warp is reused for the right camera's chained warp, and the 28
    output scalars already hold JtWJ_l + JtWJ_r etc."""
    xl, yl, zl = _warp(rt_ref, x_ref[:], y_ref[:], z_ref[:])
    sl = _camera_stats(
        xl, yl, zl, pul_ref[:], pvl_ref[:],
        intr_ref[0, 0], intr_ref[0, 1], intr_ref[0, 2], intr_ref[0, 3],
        vl_ref[:], huber,
    )
    xr, yr, zr = _warp(rt_rl_ref, xl, yl, zl)
    sr = _camera_stats(
        xr, yr, zr, pur_ref[:], pvr_ref[:],
        intr_ref[1, 0], intr_ref[1, 1], intr_ref[1, 2], intr_ref[1, 3],
        vr_ref[:], huber,
    )
    _write_stats(out_ref, [a + b for a, b in zip(sl, sr)])


@functools.partial(jax.jit, static_argnames=("huber", "interpret"))
def pose_only_gn_stats(
    rt: jax.Array,  # (3, 4) [R | t] of T_cw
    intrinsics: jax.Array,  # (4,) fx, fy, cx, cy
    x: jax.Array,  # (rows, 128) point planes
    y: jax.Array,
    z: jax.Array,
    pu: jax.Array,  # (rows, 128) pixel planes
    pv: jax.Array,
    valid: jax.Array,  # (rows, 128) f32 1/0
    huber: float,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Returns (JtWJ (6, 6), JtWr (6,), cost ()) for one GN iteration."""
    rows = x.shape[0]
    tile = min(_TILE_ROWS, rows)
    grid = (pl.cdiv(rows, tile),)
    plane_spec = pl.BlockSpec(
        (tile, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    partial_stats = pl.pallas_call(
        functools.partial(_gn_kernel, huber=huber),
        grid=grid,
        in_specs=[
            pl.BlockSpec((3, 4), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 4), lambda i: (0, 0), memory_space=pltpu.SMEM),
            plane_spec,
            plane_spec,
            plane_spec,
            plane_spec,
            plane_spec,
            plane_spec,
        ],
        out_specs=pl.BlockSpec(
            (SUBLANE, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((grid[0] * SUBLANE, LANE), x.dtype),
        interpret=interpret,
    )(rt, intrinsics.reshape(1, 4), x, y, z, pu, pv, valid)

    stats = jnp.sum(partial_stats, axis=0)[:_NUM_STATS]
    triu_rows = jnp.asarray([a for a, _ in _TRIU])
    triu_cols = jnp.asarray([b for _, b in _TRIU])
    JtWJ = jnp.zeros((6, 6), x.dtype)
    JtWJ = JtWJ.at[triu_rows, triu_cols].set(stats[:21])
    JtWJ = JtWJ.at[triu_cols, triu_rows].set(stats[:21])
    g = stats[21:27]
    cost = stats[27]
    return JtWJ, g, cost


@functools.partial(jax.jit, static_argnames=("huber", "interpret"))
def pose_only_gn_stats_stereo(
    rt: jax.Array,  # (3, 4) [R | t] of T_cw (left)
    rt_rl: jax.Array,  # (3, 4) [R | t] of the right<-left rig extrinsic
    intrinsics: jax.Array,  # (2, 4): left row, right row
    x: jax.Array,  # (rows, 128) point planes
    y: jax.Array,
    z: jax.Array,
    pul: jax.Array,  # (rows, 128) left pixel planes
    pvl: jax.Array,
    vl: jax.Array,  # (rows, 128) f32 1/0
    pur: jax.Array,  # (rows, 128) right pixel planes
    pvr: jax.Array,
    vr: jax.Array,
    huber: float,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Returns the summed left+right (JtWJ (6, 6), JtWr (6,), cost ())."""
    rows = x.shape[0]
    tile = min(_TILE_ROWS, rows)
    grid = (pl.cdiv(rows, tile),)
    plane_spec = pl.BlockSpec(
        (tile, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    smem34 = pl.BlockSpec((3, 4), lambda i: (0, 0), memory_space=pltpu.SMEM)
    partial_stats = pl.pallas_call(
        functools.partial(_gn_stereo_kernel, huber=huber),
        grid=grid,
        in_specs=[
            smem34,
            smem34,
            pl.BlockSpec((2, 4), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ]
        + [plane_spec] * 9,
        out_specs=pl.BlockSpec(
            (SUBLANE, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((grid[0] * SUBLANE, LANE), x.dtype),
        interpret=interpret,
    )(rt, rt_rl, intrinsics, x, y, z, pul, pvl, vl, pur, pvr, vr)

    stats = jnp.sum(partial_stats, axis=0)[:_NUM_STATS]
    triu_rows = jnp.asarray([a for a, _ in _TRIU])
    triu_cols = jnp.asarray([b for _, b in _TRIU])
    JtWJ = jnp.zeros((6, 6), x.dtype)
    JtWJ = JtWJ.at[triu_rows, triu_cols].set(stats[:21])
    JtWJ = JtWJ.at[triu_cols, triu_rows].set(stats[:21])
    return JtWJ, stats[21:27], stats[27]


def pack_problem_planes(points: jax.Array, pixels: jax.Array, valid: jax.Array):
    """(P, 3) points + (P, 2) pixels + (P,) bool -> plane layout, padded.

    Returns (x, y, z, pu, pv, validf) each (rows, 128), plus P.
    """
    P = points.shape[0]
    rows = max(pl.cdiv(P, LANE), 1)
    rows = ((rows + _TILE_ROWS - 1) // _TILE_ROWS) * _TILE_ROWS
    pad = rows * LANE - P
    pts = jnp.pad(points, ((0, pad), (0, 0)))
    pix = jnp.pad(pixels, ((0, pad), (0, 0)))
    vf = jnp.pad(valid.astype(points.dtype), (0, pad))
    planes = pts.T.reshape(3, rows, LANE)
    pixp = pix.T.reshape(2, rows, LANE)
    return (
        planes[0],
        planes[1],
        planes[2],
        pixp[0],
        pixp[1],
        vf.reshape(rows, LANE),
        P,
    )


# ---------------------------------------------------------------------------
# Planar 3-DoF variants (reference cpp:401-615 mono, 617-900 stereo)
# ---------------------------------------------------------------------------

# Planar stats: 6 (upper 3x3 JtWJ) + 3 (Jtr) + 1 (cost) = 10 scalar slots.
_NUM_STATS_P = 10
_TRIU3 = [(i, j) for i in range(3) for j in range(i, 3)]


def _camera_stats_planar(
    xc, yc, zc, xb, yb, pu, pv, fx, fy, cx, cy, valid, huber,
    r00, r01, r10, r11, r20, r21, cos_psi, sin_psi,
):
    """Per-camera planar-3-DoF GN statistics on (T, 128) planes.

    The Jacobian w.r.t. (x, y, psi) of the base motion matches
    pose_only_jacobian_planar3dof (ops/projection.py /
    reference cpp:1454-1515): translation columns through columns 0/1 of
    R_cam_from_base (the six r scalars), psi column via the base-frame lever
    A = -sin x_b - cos y_b, B = cos x_b - sin y_b -- which reads the SAME
    x/y planes the warp consumed, so the fused pass needs no extra input.
    """
    zc = jnp.where(valid > 0, zc, 1.0)
    inv_z = 1.0 / zc
    xiz = xc * inv_z
    yiz = yc * inv_z
    ru = fx * xiz + cx - pu
    rv = fy * yiz + cy - pv

    man = jnp.abs(ru) + jnp.abs(rv)
    w = jnp.where(man > huber, huber / man, 1.0) * valid

    fxiz = fx * inv_z
    fyiz = fy * inv_z
    du_dz = -fxiz * xiz
    dv_dz = -fyiz * yiz
    ju_x = fxiz * r00 + du_dz * r20
    ju_y = fxiz * r01 + du_dz * r21
    jv_x = fyiz * r10 + dv_dz * r20
    jv_y = fyiz * r11 + dv_dz * r21
    A = -sin_psi * xb - cos_psi * yb
    B = cos_psi * xb - sin_psi * yb
    ju = (ju_x, ju_y, ju_x * A + ju_y * B)
    jv = (jv_x, jv_y, jv_x * A + jv_y * B)

    stats = []
    for a, b in _TRIU3:
        stats.append(jnp.sum(w * (ju[a] * ju[b] + jv[a] * jv[b])))
    wru = w * ru
    wrv = w * rv
    for a in range(3):
        stats.append(jnp.sum(wru * ju[a] + wrv * jv[a]))
    stats.append(jnp.sum(w * (ru * ru + rv * rv)))
    return stats


def _gn_planar_kernel(
    rt_ref,  # (3, 4) SMEM: [R | t] of camera<-base1 at the current theta
    jp_ref,  # (1, 8) SMEM: [r00 r01 r10 r11 r20 r21 cos_psi sin_psi] of R_cb
    intr_ref,  # (1, 4) SMEM
    x_ref, y_ref, z_ref,  # (T, 128) base1-frame point planes
    pu_ref, pv_ref, valid_ref,
    out_ref,
    *, huber: float,
):
    xc, yc, zc = _warp(rt_ref, x_ref[:], y_ref[:], z_ref[:])
    stats = _camera_stats_planar(
        xc, yc, zc, x_ref[:], y_ref[:], pu_ref[:], pv_ref[:],
        intr_ref[0, 0], intr_ref[0, 1], intr_ref[0, 2], intr_ref[0, 3],
        valid_ref[:], huber,
        jp_ref[0, 0], jp_ref[0, 1], jp_ref[0, 2], jp_ref[0, 3],
        jp_ref[0, 4], jp_ref[0, 5], jp_ref[0, 6], jp_ref[0, 7],
    )
    vec = jnp.stack(stats)
    out_ref[:] = jnp.zeros((SUBLANE, LANE), vec.dtype)
    out_ref[0, :_NUM_STATS_P] = vec


def _gn_planar_stereo_kernel(
    rt_ref,  # (3, 4) SMEM: left camera<-base1
    rt_rl_ref,  # (3, 4) SMEM: right<-left rig extrinsic
    jp_ref,  # (2, 8) SMEM: row 0 left R_cb, row 1 right R_rl R_cb (+cos/sin)
    intr_ref,  # (2, 4) SMEM
    x_ref, y_ref, z_ref,
    pul_ref, pvl_ref, vl_ref,
    pur_ref, pvr_ref, vr_ref,
    out_ref,
    *, huber: float,
):
    xl, yl, zl = _warp(rt_ref, x_ref[:], y_ref[:], z_ref[:])
    sl = _camera_stats_planar(
        xl, yl, zl, x_ref[:], y_ref[:], pul_ref[:], pvl_ref[:],
        intr_ref[0, 0], intr_ref[0, 1], intr_ref[0, 2], intr_ref[0, 3],
        vl_ref[:], huber,
        jp_ref[0, 0], jp_ref[0, 1], jp_ref[0, 2], jp_ref[0, 3],
        jp_ref[0, 4], jp_ref[0, 5], jp_ref[0, 6], jp_ref[0, 7],
    )
    xr, yr, zr = _warp(rt_rl_ref, xl, yl, zl)
    sr = _camera_stats_planar(
        xr, yr, zr, x_ref[:], y_ref[:], pur_ref[:], pvr_ref[:],
        intr_ref[1, 0], intr_ref[1, 1], intr_ref[1, 2], intr_ref[1, 3],
        vr_ref[:], huber,
        jp_ref[1, 0], jp_ref[1, 1], jp_ref[1, 2], jp_ref[1, 3],
        jp_ref[1, 4], jp_ref[1, 5], jp_ref[1, 6], jp_ref[1, 7],
    )
    vec = jnp.stack([a + b for a, b in zip(sl, sr)])
    out_ref[:] = jnp.zeros((SUBLANE, LANE), vec.dtype)
    out_ref[0, :_NUM_STATS_P] = vec


def _finish_planar_stats(partial_stats):
    stats = jnp.sum(partial_stats, axis=0)[:_NUM_STATS_P]
    rows3 = jnp.asarray([a for a, _ in _TRIU3])
    cols3 = jnp.asarray([b for _, b in _TRIU3])
    JtWJ = jnp.zeros((3, 3), partial_stats.dtype)
    JtWJ = JtWJ.at[rows3, cols3].set(stats[:6])
    JtWJ = JtWJ.at[cols3, rows3].set(stats[:6])
    return JtWJ, stats[6:9], stats[9]


@functools.partial(jax.jit, static_argnames=("huber", "interpret"))
def pose_only_gn_stats_planar(
    rt: jax.Array,  # (3, 4) [R | t] camera<-base1 at the current theta
    jp: jax.Array,  # (8,) [r00 r01 r10 r11 r20 r21 cos_psi sin_psi]
    intrinsics: jax.Array,  # (4,)
    x: jax.Array, y: jax.Array, z: jax.Array,  # (rows, 128) base1 planes
    pu: jax.Array, pv: jax.Array, valid: jax.Array,
    huber: float,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Returns (JtWJ (3, 3), JtWr (3,), cost ()) for one planar GN iter."""
    rows = x.shape[0]
    tile = min(_TILE_ROWS, rows)
    grid = (pl.cdiv(rows, tile),)
    plane_spec = pl.BlockSpec(
        (tile, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    partial_stats = pl.pallas_call(
        functools.partial(_gn_planar_kernel, huber=huber),
        grid=grid,
        in_specs=[
            pl.BlockSpec((3, 4), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 8), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 4), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ] + [plane_spec] * 6,
        out_specs=pl.BlockSpec(
            (SUBLANE, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((grid[0] * SUBLANE, LANE), x.dtype),
        interpret=interpret,
    )(rt, jp.reshape(1, 8), intrinsics.reshape(1, 4), x, y, z, pu, pv, valid)
    return _finish_planar_stats(partial_stats)


@functools.partial(jax.jit, static_argnames=("huber", "interpret"))
def pose_only_gn_stats_planar_stereo(
    rt: jax.Array,  # (3, 4) left camera<-base1
    rt_rl: jax.Array,  # (3, 4) right<-left
    jp: jax.Array,  # (2, 8) left/right Jacobian params
    intrinsics: jax.Array,  # (2, 4)
    x: jax.Array, y: jax.Array, z: jax.Array,
    pul: jax.Array, pvl: jax.Array, vl: jax.Array,
    pur: jax.Array, pvr: jax.Array, vr: jax.Array,
    huber: float,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Returns the summed left+right (JtWJ (3, 3), JtWr (3,), cost ())."""
    rows = x.shape[0]
    tile = min(_TILE_ROWS, rows)
    grid = (pl.cdiv(rows, tile),)
    plane_spec = pl.BlockSpec(
        (tile, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    smem34 = pl.BlockSpec((3, 4), lambda i: (0, 0), memory_space=pltpu.SMEM)
    partial_stats = pl.pallas_call(
        functools.partial(_gn_planar_stereo_kernel, huber=huber),
        grid=grid,
        in_specs=[
            smem34,
            smem34,
            pl.BlockSpec((2, 8), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((2, 4), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ] + [plane_spec] * 9,
        out_specs=pl.BlockSpec(
            (SUBLANE, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((grid[0] * SUBLANE, LANE), x.dtype),
        interpret=interpret,
    )(rt, rt_rl, jp, intrinsics, x, y, z, pul, pvl, vl, pur, pvr, vr)
    return _finish_planar_stats(partial_stats)
