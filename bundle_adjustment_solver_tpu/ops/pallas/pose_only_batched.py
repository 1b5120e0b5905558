"""Pallas TPU kernels: fused BATCHED pose-only GN statistics, frames along
lanes.

The reference solves one frame per call (pose_only_bundle_adjustment_solver
.cpp:8-399); the vmapped XLA batched path (solvers/pose_only.py) already
runs thousands of frames per launch, but its per-frame stats come from
small per-frame einsums plus (B, 6, 6) assembly -- profiled on v5e, most of
its device time is XLA glue rather than math.

These kernels use the OTHER natural TPU mapping: frame index -> lane,
point index -> sublane. Layout (P_pad, B_pad) planes:

  * per-frame pose/intrinsic values arrive as (12, B) / (4|8, B) row planes
    and broadcast over the point sublanes as (1, 128) rows (free on VPU);
  * per-frame reductions are axis-0 sums of (Pc, 128) planes -> (1, 128),
    i.e. full-tile VPU reductions with zero cross-lane traffic;
  * the output is a (32, B) stats plane: rows 0..20 = upper-tri JtWJ,
    21..26 = JtWr, 27 = robust cost -- ready for the flat sym6 solve
    (ops/sym6.py) with a single (32, B) -> (B, 32) transpose per iteration.

No gathers, no one-hots, no relayouts: every operation is lane-aligned.
The host packs the problem once per solve (`pack_frames_planes`); the
per-iteration pose planes are rebuilt in XLA from the (B, 3, 3) carry.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .warp import LANE

_STATS = 28  # 21 triu JtWJ + 6 JtWr + 1 cost
_OUT_ROWS = 32  # padded to a sublane multiple
_PCHUNK = 256  # point rows per grid step (VMEM bound: ~9 planes x 128 KB)


def _cam_stats_lanes(xc, yc, zc, pu, pv, fx, fy, cx, cy, valid, huber):
    """Per-camera GN stats on (Pc, 128) planes, one frame per lane.

    fx..cy are (1, 128) per-frame rows; returns 28 (1, 128) stat rows
    (reduced over the point sublanes). Same math as the per-frame kernel
    (pose_only_gn._camera_stats), Jacobian w.r.t. THIS camera's frame.
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

    def rsum(a):
        return jnp.sum(a, axis=0, keepdims=True)  # (1, 128)

    stats = []
    for a in range(6):
        for b in range(a, 6):
            stats.append(rsum(w * (ju[a] * ju[b] + jv[a] * jv[b])))
    wru = w * ru
    wrv = w * rv
    for a in range(6):
        stats.append(rsum(wru * ju[a] + wrv * jv[a]))
    stats.append(rsum(w * (ru * ru + rv * rv)))
    return stats


def _warp_rows(pose_ref, x, y, z):
    """Per-frame warp: pose_ref rows broadcast over point sublanes."""
    r = lambda k: pose_ref[k : k + 1, :]
    xc = r(0) * x + r(1) * y + r(2) * z + r(9)
    yc = r(3) * x + r(4) * y + r(5) * z + r(10)
    zc = r(6) * x + r(7) * y + r(8) * z + r(11)
    return xc, yc, zc


def _accumulate(out_ref, stats):
    block = jnp.concatenate(
        stats + [jnp.zeros((_OUT_ROWS - _STATS, LANE), jnp.float32)], axis=0
    )
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = block

    @pl.when(j != 0)
    def _():
        out_ref[:] = out_ref[:] + block


def _bgn_mono_kernel(pose_ref, intr_ref, x_ref, y_ref, z_ref,
                     pu_ref, pv_ref, v_ref, out_ref, *, huber):
    xc, yc, zc = _warp_rows(pose_ref, x_ref[:], y_ref[:], z_ref[:])
    i = lambda k: intr_ref[k : k + 1, :]
    stats = _cam_stats_lanes(
        xc, yc, zc, pu_ref[:], pv_ref[:], i(0), i(1), i(2), i(3),
        v_ref[:], huber,
    )
    _accumulate(out_ref, stats)


def _bgn_stereo_kernel(pose_ref, intr_ref, rig_ref, x_ref, y_ref, z_ref,
                       pul_ref, pvl_ref, vl_ref, pur_ref, pvr_ref, vr_ref,
                       out_ref, *, huber):
    xl, yl, zl = _warp_rows(pose_ref, x_ref[:], y_ref[:], z_ref[:])
    i = lambda k: intr_ref[k : k + 1, :]
    sl = _cam_stats_lanes(
        xl, yl, zl, pul_ref[:], pvl_ref[:], i(0), i(1), i(2), i(3),
        vl_ref[:], huber,
    )
    # Chained right warp with the shared scalar rig (right <- left).
    xr = rig_ref[0, 0] * xl + rig_ref[0, 1] * yl + rig_ref[0, 2] * zl + rig_ref[0, 3]
    yr = rig_ref[1, 0] * xl + rig_ref[1, 1] * yl + rig_ref[1, 2] * zl + rig_ref[1, 3]
    zr = rig_ref[2, 0] * xl + rig_ref[2, 1] * yl + rig_ref[2, 2] * zl + rig_ref[2, 3]
    sr = _cam_stats_lanes(
        xr, yr, zr, pur_ref[:], pvr_ref[:], i(4), i(5), i(6), i(7),
        vr_ref[:], huber,
    )
    _accumulate(out_ref, [a + b for a, b in zip(sl, sr)])


def _round_up(n, m):
    return -(-n // m) * m


def pack_frames_planes(arr, p_pad, b_pad):
    """(B, P[, k]) -> k planes of (P_pad, B_pad): frames along lanes."""
    if arr.ndim == 2:
        out = jnp.zeros((p_pad, b_pad), arr.dtype)
        return out.at[: arr.shape[1], : arr.shape[0]].set(arr.T)
    return [
        pack_frames_planes(arr[..., k], p_pad, b_pad)
        for k in range(arr.shape[-1])
    ]


def plane_dims(B, P):
    """(P_pad, B_pad) for the frames-along-lanes layout."""
    pc = min(_round_up(P, 8), _PCHUNK)
    return _round_up(P, pc), _round_up(B, LANE)


def pose_planes(R, t, b_pad):
    """(B, 3, 3) + (B, 3) carry -> (12, B_pad) pose plane (per iteration)."""
    B = R.shape[0]
    flat = jnp.concatenate([R.reshape(B, 9), t], axis=1)  # (B, 12)
    out = jnp.zeros((12, b_pad), flat.dtype)
    return out.at[:, :B].set(flat.T)


def intr_planes(rows, b_pad):
    """List of (B,) or scalar per-frame intrinsic rows -> (len, B_pad)."""
    n = len(rows)
    out = jnp.zeros((n, b_pad), jnp.float32)
    for k, r in enumerate(rows):
        r = jnp.asarray(r, jnp.float32)
        if r.ndim == 0:
            out = out.at[k, :].set(r)
        else:
            out = out.at[k, : r.shape[0]].set(r)
    return out


def _grid_call(kernel, n_planes, p_pad, b_pad, extra_smem, interpret):
    pc = min(p_pad, _PCHUNK)
    grid = (b_pad // LANE, p_pad // pc)
    plane = pl.BlockSpec((pc, LANE), lambda b, p: (p, b),
                         memory_space=pltpu.VMEM)
    row_specs = [
        pl.BlockSpec((12, LANE), lambda b, p: (0, b),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((8, LANE), lambda b, p: (0, b),
                     memory_space=pltpu.VMEM),
    ]
    if extra_smem:
        row_specs.append(
            pl.BlockSpec((3, 4), lambda b, p: (0, 0),
                         memory_space=pltpu.SMEM)
        )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=row_specs + [plane] * n_planes,
        out_specs=pl.BlockSpec((_OUT_ROWS, LANE), lambda b, p: (0, b),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((_OUT_ROWS, b_pad), jnp.float32),
        interpret=interpret,
    )


@functools.partial(jax.jit, static_argnames=("huber", "interpret"))
def batched_mono_gn_stats(pose12, intr, x, y, z, pu, pv, v,
                          huber: float, interpret: bool = False):
    """(32, B_pad) stats plane for B mono frames. intr: (8, B_pad) (rows
    4..7 ignored)."""
    p_pad, b_pad = x.shape
    return _grid_call(
        functools.partial(_bgn_mono_kernel, huber=huber),
        6, p_pad, b_pad, extra_smem=False, interpret=interpret,
    )(pose12, intr, x, y, z, pu, pv, v)


@functools.partial(jax.jit, static_argnames=("huber", "interpret"))
def batched_stereo_gn_stats(pose12, intr, rig34, x, y, z, pul, pvl, vl,
                            pur, pvr, vr, huber: float,
                            interpret: bool = False):
    """(32, B_pad) summed left+right stats for B stereo frames.
    intr: (8, B_pad) = [fxl, fyl, cxl, cyl, fxr, fyr, cxr, cyr] rows;
    rig34: (3, 4) right<-left extrinsic (shared across frames)."""
    p_pad, b_pad = x.shape
    return _grid_call(
        functools.partial(_bgn_stereo_kernel, huber=huber),
        9, p_pad, b_pad, extra_smem=True, interpret=interpret,
    )(pose12, intr, rig34, x, y, z, pul, pvl, vl, pur, pvr, vr)


# ---------------------------------------------------------------------------
# Planar 3-DoF variants (reference cpp:401-900): same frames-along-lanes
# layout; stats shrink to 10 rows (6 triu 3x3 + 3 gradient + cost) and the
# Jacobian chains through the shared camera<-base rotation (SMEM) with
# per-frame cos/sin(psi) rows.
# ---------------------------------------------------------------------------

_STATS_P3 = 10
_OUT_ROWS_P3 = 16


def _cam_stats_planar_lanes(
    xc, yc, zc, pu, pv, fx, fy, cx, cy, cpsi, spsi, xb, yb,
    rcb_ref, valid, huber,
):
    """Planar 3-DoF stats on (Pc, 128) planes (one frame per lane): the
    translation columns go through columns 0/1 of the shared R_cb, the psi
    column uses the lever terms A/B of the BASE-frame point (reference
    cpp:1454-1515; ops/projection.pose_only_jacobian_planar3dof)."""
    zc = jnp.where(valid > 0, zc, 1.0)
    inv_z = 1.0 / zc
    ru = fx * xc * inv_z + cx - pu
    rv = fy * yc * inv_z + cy - pv

    man = jnp.abs(ru) + jnp.abs(rv)
    w = jnp.where(man > huber, huber / man, 1.0) * valid

    fx_inv_z = fx * inv_z
    fy_inv_z = fy * inv_z
    du_dz = -fx_inv_z * xc * inv_z
    dv_dz = -fy_inv_z * yc * inv_z
    ju_x = fx_inv_z * rcb_ref[0, 0] + du_dz * rcb_ref[2, 0]
    ju_y = fx_inv_z * rcb_ref[0, 1] + du_dz * rcb_ref[2, 1]
    jv_x = fy_inv_z * rcb_ref[1, 0] + dv_dz * rcb_ref[2, 0]
    jv_y = fy_inv_z * rcb_ref[1, 1] + dv_dz * rcb_ref[2, 1]
    A = -spsi * xb - cpsi * yb
    B = cpsi * xb - spsi * yb
    ju = (ju_x, ju_y, ju_x * A + ju_y * B)
    jv = (jv_x, jv_y, jv_x * A + jv_y * B)

    def rsum(a):
        return jnp.sum(a, axis=0, keepdims=True)

    stats = []
    for a in range(3):
        for b in range(a, 3):
            stats.append(rsum(w * (ju[a] * ju[b] + jv[a] * jv[b])))
    wru = w * ru
    wrv = w * rv
    for a in range(3):
        stats.append(rsum(wru * ju[a] + wrv * jv[a]))
    stats.append(rsum(w * (ru * ru + rv * rv)))
    return stats


def _accumulate_p3(out_ref, stats):
    block = jnp.concatenate(
        stats + [jnp.zeros((_OUT_ROWS_P3 - _STATS_P3, LANE), jnp.float32)],
        axis=0,
    )
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:] = block

    @pl.when(j != 0)
    def _():
        out_ref[:] = out_ref[:] + block


def _bgn_planar_mono_kernel(pose_ref, intr_ref, psi_ref, rcb_ref,
                            x_ref, y_ref, z_ref, pu_ref, pv_ref, v_ref,
                            out_ref, *, huber):
    xc, yc, zc = _warp_rows(pose_ref, x_ref[:], y_ref[:], z_ref[:])
    i = lambda k: intr_ref[k : k + 1, :]
    stats = _cam_stats_planar_lanes(
        xc, yc, zc, pu_ref[:], pv_ref[:], i(0), i(1), i(2), i(3),
        psi_ref[0:1, :], psi_ref[1:2, :], x_ref[:], y_ref[:],
        rcb_ref, v_ref[:], huber,
    )
    _accumulate_p3(out_ref, stats)


def _bgn_planar_stereo_kernel(pose_ref, intr_ref, psi_ref, rcb_ref,
                              rcbr_ref, rig_ref, x_ref, y_ref, z_ref,
                              pul_ref, pvl_ref, vl_ref,
                              pur_ref, pvr_ref, vr_ref, out_ref, *, huber):
    xb, yb = x_ref[:], y_ref[:]
    xl, yl, zl = _warp_rows(pose_ref, xb, yb, z_ref[:])
    i = lambda k: intr_ref[k : k + 1, :]
    cp, sp = psi_ref[0:1, :], psi_ref[1:2, :]
    sl = _cam_stats_planar_lanes(
        xl, yl, zl, pul_ref[:], pvl_ref[:], i(0), i(1), i(2), i(3),
        cp, sp, xb, yb, rcb_ref, vl_ref[:], huber,
    )
    xr = rig_ref[0, 0] * xl + rig_ref[0, 1] * yl + rig_ref[0, 2] * zl + rig_ref[0, 3]
    yr = rig_ref[1, 0] * xl + rig_ref[1, 1] * yl + rig_ref[1, 2] * zl + rig_ref[1, 3]
    zr = rig_ref[2, 0] * xl + rig_ref[2, 1] * yl + rig_ref[2, 2] * zl + rig_ref[2, 3]
    sr = _cam_stats_planar_lanes(
        xr, yr, zr, pur_ref[:], pvr_ref[:], i(4), i(5), i(6), i(7),
        cp, sp, xb, yb, rcbr_ref, vr_ref[:], huber,
    )
    _accumulate_p3(out_ref, [a + b for a, b in zip(sl, sr)])


def _grid_call_p3(kernel, n_smem, n_planes, p_pad, b_pad, interpret):
    pc = min(p_pad, _PCHUNK)
    grid = (b_pad // LANE, p_pad // pc)
    plane = pl.BlockSpec((pc, LANE), lambda b, p: (p, b),
                         memory_space=pltpu.VMEM)
    specs = [
        pl.BlockSpec((12, LANE), lambda b, p: (0, b),
                     memory_space=pltpu.VMEM),  # pose rows
        pl.BlockSpec((8, LANE), lambda b, p: (0, b),
                     memory_space=pltpu.VMEM),  # intrinsics rows
        pl.BlockSpec((2, LANE), lambda b, p: (0, b),
                     memory_space=pltpu.VMEM),  # cos/sin psi rows
    ] + [
        pl.BlockSpec((3, 4), lambda b, p: (0, 0), memory_space=pltpu.SMEM)
    ] * n_smem
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=specs + [plane] * n_planes,
        out_specs=pl.BlockSpec((_OUT_ROWS_P3, LANE), lambda b, p: (0, b),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((_OUT_ROWS_P3, b_pad), jnp.float32),
        interpret=interpret,
    )


@functools.partial(jax.jit, static_argnames=("huber", "interpret"))
def batched_planar_mono_gn_stats(pose12, intr, psi2, rcb34, x, y, z,
                                 pu, pv, v, huber: float,
                                 interpret: bool = False):
    """(16, B_pad) planar stats plane for B mono frames (rows 0..9 used)."""
    p_pad, b_pad = x.shape
    return _grid_call_p3(
        functools.partial(_bgn_planar_mono_kernel, huber=huber),
        1, 6, p_pad, b_pad, interpret,
    )(pose12, intr, psi2, rcb34, x, y, z, pu, pv, v)


@functools.partial(jax.jit, static_argnames=("huber", "interpret"))
def batched_planar_stereo_gn_stats(pose12, intr, psi2, rcb34, rcbr34,
                                   rig34, x, y, z, pul, pvl, vl,
                                   pur, pvr, vr, huber: float,
                                   interpret: bool = False):
    """(16, B_pad) summed left+right planar stats for B stereo frames."""
    p_pad, b_pad = x.shape
    return _grid_call_p3(
        functools.partial(_bgn_planar_stereo_kernel, huber=huber),
        3, 9, p_pad, b_pad, interpret,
    )(pose12, intr, psi2, rcb34, rcbr34, rig34,
      x, y, z, pul, pvl, vl, pur, pvr, vr)


# ---------------------------------------------------------------------------
# Plane-orientation SE(3) math for the lockstep drivers: keeping the pose
# carry as (12, B) rows makes the per-iteration update a single elementwise
# fusion instead of batched (B, 3, 3) matmuls (which tile-pad 9 -> 1024
# elements and dominated the fused solvers' device time -- profiled on v5e:
# kernel 16%, XLA glue 84%).
# ---------------------------------------------------------------------------


def se3_exp_rows(xi_rows):
    """(6, B) twist rows [v; w] -> ((9, B) R rows, (3, B) t rows).

    Same guarded coefficients as ops/lie.se3_exp; wx^2 is expanded
    algebraically as w w^T - theta^2 I (identical up to rounding).
    """
    from ...ops.lie import (
        _one_minus_cos_over_theta_sq,
        _sin_theta_over_theta,
        _theta_minus_sin_over_theta_cubed,
    )

    v0, v1, v2 = xi_rows[0], xi_rows[1], xi_rows[2]
    w0, w1, w2 = xi_rows[3], xi_rows[4], xi_rows[5]
    th2 = w0 * w0 + w1 * w1 + w2 * w2
    a = _sin_theta_over_theta(th2)
    b = _one_minus_cos_over_theta_sq(th2)
    c = _theta_minus_sin_over_theta_cubed(th2)

    def rot(coef_skew, coef_sq):
        # I + cs * wx + cq * (w w^T - th2 I), row-major 9 rows.
        return [
            1.0 + coef_sq * (w0 * w0 - th2),
            -coef_skew * w2 + coef_sq * w0 * w1,
            coef_skew * w1 + coef_sq * w0 * w2,
            coef_skew * w2 + coef_sq * w0 * w1,
            1.0 + coef_sq * (w1 * w1 - th2),
            -coef_skew * w0 + coef_sq * w1 * w2,
            -coef_skew * w1 + coef_sq * w0 * w2,
            coef_skew * w0 + coef_sq * w1 * w2,
            1.0 + coef_sq * (w2 * w2 - th2),
        ]

    R = rot(a, b)
    V = rot(b, c)
    t = [
        V[0] * v0 + V[1] * v1 + V[2] * v2,
        V[3] * v0 + V[4] * v1 + V[5] * v2,
        V[6] * v0 + V[7] * v1 + V[8] * v2,
    ]
    return R, t


def compose_rows(Ar, At, Br, Bt):
    """Row-wise rigid compose: (A R, A t) * (B R, B t) on lists of (B,) /
    (.., B) rows. Returns (9 rows, 3 rows) of A@B."""
    Cr = []
    for i in range(3):
        for j in range(3):
            Cr.append(
                Ar[3 * i] * Br[j]
                + Ar[3 * i + 1] * Br[3 + j]
                + Ar[3 * i + 2] * Br[6 + j]
            )
    Ct = [
        Ar[3 * i] * Bt[0] + Ar[3 * i + 1] * Bt[1] + Ar[3 * i + 2] * Bt[2]
        + At[i]
        for i in range(3)
    ]
    return Cr, Ct


def add_front_se3_rows(pose12, delta_rows):
    """exp(delta) * pose on a (12, B) pose plane; delta_rows (6, B)."""
    dR, dt = se3_exp_rows(delta_rows)
    R = [pose12[k] for k in range(9)]
    t = [pose12[9 + k] for k in range(3)]
    Cr, Ct = compose_rows(dR, dt, R, t)
    return jnp.stack(Cr + Ct)


def pose_rows_to_Rt(pose12, B):
    """(12, B_pad) plane -> ((B, 3, 3), (B, 3)) for result assembly."""
    flat = pose12[:, :B].T  # (B, 12)
    return flat[:, :9].reshape(B, 3, 3), flat[:, 9:12]
