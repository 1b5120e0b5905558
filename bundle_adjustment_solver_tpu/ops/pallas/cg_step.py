"""Fused pose-side PCG step for the point-major reduced-system solve.

One Pallas kernel performs the ENTIRE pose-side algebra of a PCG iteration
on the reduced camera system S x = rhs (the solve the reference does
directly at core/full_bundle_adjustment_solver.cpp:890-908):

    Sp    = A p - corr            (A in flat tri layout, corr from the
                                   landmark-side matvec kernel)
    alpha = rz / (p . Sp)
    x'    = x + alpha p
    r'    = r - alpha Sp
    z     = M^-1 r'               (block-Jacobi / Schur-Jacobi, tri layout)
    rz'   = r' . z
    beta  = rz' / rz
    p'    = z + beta p
    rr    = r' . r'               (for the termination test)

Round-3 profiling (PERF.md "flagship glue decomposition") measured these as
~10 separate dispatch-bound XLA fusions of (N, 6)/(N, 21) arrays at ~30 us
each -- ~0.3 ms per CG iteration of pure launch overhead at N_opt = 10k.
Fusing them into one single-block VPU kernel removes all of it: the kernel
reads ~3 MB of VMEM-resident planes and costs ~20 us.

Layout: everything lives in PLANE form -- components along sublanes, poses
along lanes, `Np` padded to a multiple of 128 -- so each of the 21 triangle
components of A / M^-1 and the 6 vector components is one contiguous row
and the sym6 matvec is 36 row-wise multiply-adds on the VPU. `AP` stacks
the damped-A planes (rows 0:21) over the preconditioner planes (rows 21:42)
and is built once per LM iteration (both are constant across the CG solve).
Padded lanes are zero in every operand and provably stay zero through the
iteration, so the scalar reductions are exact.

The flat (a, b) a<=b component order matches ops/sym6.py (_TRI6) and the
assembly kernel's scatter panels (ops/pallas/full_ba_pm.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...ops.sym6 import _IDX, _TRI6  # shared flat sym6 component order

LANES = 128

# Single-block VMEM residency of the fused step is ~336 bytes/pose lane
# (AP 42 rows + 4 state operands x 6 rows + 3 outputs x 6 rows, all f32).
# 16,384 lanes ~ 5.5 MB -- comfortably inside v5e VMEM next to compiler
# scratch. Above this the engines route to the unfused XLA loop body
# (solvers/full_ba_pm._block_pcg_pm), which has no such bound: the fused
# kernel's ~0.3 ms/CG-iteration dispatch saving is amortized away at that
# scale anyway (the landmark-side matvec dominates).
MAX_FUSED_POSES = 16_384


def padded_poses(n_opt: int) -> int:
    """Lane-padded pose count for the plane layout."""
    return ((n_opt + LANES - 1) // LANES) * LANES


def _sym6_rows(ref, base, v):
    """y[a] = sum_b T[(a,b)] * v[b] with T rows at ref[base:base+21].

    `v` is a list of 6 (1, Np) rows; returns the same. Accumulation order
    (b = 0..5) matches ops/sym6.tri6_matvec for bitwise-comparable sums.
    """
    out = []
    for a in range(6):
        acc = None
        for b in range(6):
            key = (a, b) if a <= b else (b, a)
            i = base + _IDX[key]
            term = ref[i:i + 1, :] * v[b]
            acc = term if acc is None else acc + term
        out.append(acc)
    return out


def _dot6(u, v):
    acc = None
    for a in range(6):
        s = jnp.sum(u[a] * v[a])
        acc = s if acc is None else acc + s
    return acc


def _cg_step_kernel(ap_ref, corr_ref, x_ref, r_ref, p_ref, rz_ref,
                    xo_ref, ro_ref, po_ref, sc_ref):
    p = [p_ref[a:a + 1, :] for a in range(6)]
    Ap = _sym6_rows(ap_ref, 0, p)
    Sp = [Ap[a] - corr_ref[a:a + 1, :] for a in range(6)]
    pSp = _dot6(p, Sp)
    rz = rz_ref[0, 0]
    alpha = rz / jnp.maximum(pSp, 1e-30)
    rn = []
    for a in range(6):
        xo_ref[a:a + 1, :] = x_ref[a:a + 1, :] + alpha * p[a]
        ra = r_ref[a:a + 1, :] - alpha * Sp[a]
        rn.append(ra)
        ro_ref[a:a + 1, :] = ra
    z = _sym6_rows(ap_ref, 21, rn)
    rz_new = _dot6(rn, z)
    beta = rz_new / jnp.maximum(rz, 1e-30)
    for a in range(6):
        po_ref[a:a + 1, :] = z[a] + beta * p[a]
    sc_ref[0, 0] = alpha
    sc_ref[1, 0] = rz_new
    sc_ref[2, 0] = _dot6(rn, rn)


@functools.partial(jax.jit, static_argnames=("interpret",))
def cg_pose_step(AP, corr, x, r, p, rz, interpret: bool = False):
    """One fused PCG iteration on the pose planes.

    AP (42, Np) f32: damped-A tri planes stacked over preconditioner tri
    planes. corr/x/r/p (6, Np) f32. rz: scalar. Returns
    (x', r', p', alpha, rz', rr)."""
    Np = AP.shape[1]
    xo, ro, po, sc = pl.pallas_call(
        _cg_step_kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5
        + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3
        + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_shape=[
            jax.ShapeDtypeStruct((6, Np), jnp.float32),
            jax.ShapeDtypeStruct((6, Np), jnp.float32),
            jax.ShapeDtypeStruct((6, Np), jnp.float32),
            jax.ShapeDtypeStruct((3, 1), jnp.float32),  # SMEM scalars are 2D
        ],
        interpret=interpret,
    )(AP, corr, x, r, p, jnp.reshape(rz, (1, 1)).astype(jnp.float32))
    return xo, ro, po, sc[0, 0], sc[1, 0], sc[2, 0]


def _cg_sp_kernel(a_ref, corr_ref, p_ref, sp_ref, sc_ref):
    """Sp = A p - corr plus the LOCAL p . Sp partial (pose-sharded CG)."""
    p = [p_ref[a:a + 1, :] for a in range(6)]
    Ap = _sym6_rows(a_ref, 0, p)
    Sp = [Ap[a] - corr_ref[a:a + 1, :] for a in range(6)]
    for a in range(6):
        sp_ref[a:a + 1, :] = Sp[a]
    sc_ref[0, 0] = _dot6(p, Sp)


@functools.partial(jax.jit, static_argnames=("interpret",))
def cg_sp_partial(A21, corr, p, interpret: bool = False):
    """Pose-sharded PCG, phase 1 of the split step: Sp on the LOCAL pose
    planes plus the local p . Sp dot partial (psum it before `cg_update_
    partial` -- alpha must use the global dot).

    A21 (21, Nl) f32 damped-A tri planes of this shard's poses; corr/p
    (6, Nl) f32. Returns (Sp (6, Nl), pSp_partial scalar). The single-chip
    engine fuses both phases into `cg_pose_step`; sharding splits them at
    the two global reductions."""
    Np = A21.shape[1]
    sp, sc = pl.pallas_call(
        _cg_sp_kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_shape=[
            jax.ShapeDtypeStruct((6, Np), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ],
        interpret=interpret,
    )(A21, corr, p)
    return sp, sc[0, 0]


def _cg_update_kernel(m_ref, x_ref, r_ref, p_ref, sp_ref, al_ref,
                      xo_ref, ro_ref, zo_ref, sc_ref):
    """x/r updates with a GLOBAL alpha + z = M^-1 r' and local dot partials."""
    alpha = al_ref[0, 0]
    rn = []
    for a in range(6):
        xo_ref[a:a + 1, :] = x_ref[a:a + 1, :] + alpha * p_ref[a:a + 1, :]
        ra = r_ref[a:a + 1, :] - alpha * sp_ref[a:a + 1, :]
        rn.append(ra)
        ro_ref[a:a + 1, :] = ra
    z = _sym6_rows(m_ref, 0, rn)
    for a in range(6):
        zo_ref[a:a + 1, :] = z[a]
    sc_ref[0, 0] = _dot6(rn, z)
    sc_ref[1, 0] = _dot6(rn, rn)


@functools.partial(jax.jit, static_argnames=("interpret",))
def cg_update_partial(M21, x, r, p, Sp, alpha, interpret: bool = False):
    """Pose-sharded PCG, phase 2: axpy updates with the globally-reduced
    alpha, preconditioner apply, and the local r'.z / r'.r' dot partials
    (psum them; beta and the termination test need the global values).

    M21 (21, Nl) f32 preconditioner tri planes; x/r/p/Sp (6, Nl); alpha
    scalar. Returns (x', r', z, rz_partial, rr_partial). The next search
    direction p' = z + beta p is left to XLA where it fuses into the
    all-gather operand build."""
    Np = M21.shape[1]
    xo, ro, zo, sc = pl.pallas_call(
        _cg_update_kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5
        + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3
        + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_shape=[
            jax.ShapeDtypeStruct((6, Np), jnp.float32),
            jax.ShapeDtypeStruct((6, Np), jnp.float32),
            jax.ShapeDtypeStruct((6, Np), jnp.float32),
            jax.ShapeDtypeStruct((2, 1), jnp.float32),
        ],
        interpret=interpret,
    )(M21, x, r, p, Sp, jnp.reshape(alpha, (1, 1)).astype(jnp.float32))
    return xo, ro, zo, sc[0, 0], sc[1, 0]


def to_planes(v, Np):
    """(n, 6) -> zero-padded (6, Np) plane form."""
    n = v.shape[0]
    return jnp.zeros((6, Np), jnp.float32).at[:, :n].set(v.T)


def plane_sym6_matvec(T, v):
    """y = T @ v on planes: T (21, Np) tri components, v (6, Np)."""
    rows = []
    for a in range(6):
        acc = None
        for b in range(6):
            key = (a, b) if a <= b else (b, a)
            term = T[_IDX[key]] * v[b]
            acc = term if acc is None else acc + term
        rows.append(acc)
    return jnp.stack(rows)
