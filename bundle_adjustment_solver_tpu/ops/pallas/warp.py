"""Pallas TPU kernel: batched SE(3) point warp, plane (SoA) layout.

The deliberate analogue of the reference's AVX point warper
(simd::PointWarper, utility/simd_library.h:63-84, .cpp:36-137), designed for
the VPU instead of translated from it:

  - the reference packs AoS float3 into 6 pre-allocated 100M-float SoA
    staging buffers (2.4 GB up front, simd_library.cpp:13-19) and runs 8-wide
    AVX FMAs; its kernel also applies the pose twice (cpp:82-97) and its
    scalar tail is unreachable (SURVEY.md §2) -- bugs we do not reproduce;
  - here points live as three (rows, 128) f32 planes (x, y, z), each tile an
    (8, 128) VPU register block: 9 broadcast multiply-adds per tile, zero
    wasted lanes, no staging copies, correct tail handling by padding.

`warp_points_planes` is the raw kernel (plane layout in/out);
`warp_points` is the (P, 3) convenience wrapper.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
SUBLANE = 8
_TILE_ROWS = 64  # rows of 128 lanes per grid step: 8k points per tile


def _warp_kernel(rt_ref, x_ref, y_ref, z_ref, xo_ref, yo_ref, zo_ref):
    """One (TILE_ROWS, 128) block: [x';y';z'] = R [x;y;z] + t.

    rt_ref is a (3, 4) SMEM block holding [R | t] row-major.
    """
    x = x_ref[:]
    y = y_ref[:]
    z = z_ref[:]
    xo_ref[:] = rt_ref[0, 0] * x + rt_ref[0, 1] * y + rt_ref[0, 2] * z + rt_ref[0, 3]
    yo_ref[:] = rt_ref[1, 0] * x + rt_ref[1, 1] * y + rt_ref[1, 2] * z + rt_ref[1, 3]
    zo_ref[:] = rt_ref[2, 0] * x + rt_ref[2, 1] * y + rt_ref[2, 2] * z + rt_ref[2, 3]


@functools.partial(jax.jit, static_argnames=("interpret",))
def warp_points_planes(
    rt: jax.Array,  # (3, 4) [R | t]
    x: jax.Array,  # (rows, 128)
    y: jax.Array,
    z: jax.Array,
    interpret: bool = False,
):
    """Warp plane-layout points; rows must be a multiple of 8."""
    rows = x.shape[0]
    tile = min(_TILE_ROWS, rows)
    grid = (pl.cdiv(rows, tile),)
    plane_spec = pl.BlockSpec(
        (tile, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    out_shape = jax.ShapeDtypeStruct((rows, LANE), x.dtype)
    return pl.pallas_call(
        _warp_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((3, 4), lambda i: (0, 0), memory_space=pltpu.SMEM),
            plane_spec,
            plane_spec,
            plane_spec,
        ],
        out_specs=(plane_spec, plane_spec, plane_spec),
        out_shape=(out_shape, out_shape, out_shape),
        interpret=interpret,
    )(rt, x, y, z)


def to_planes(points: jax.Array) -> tuple[jax.Array, jax.Array, jax.Array, int]:
    """(P, 3) -> three (rows, 128) planes, padded; returns original P."""
    P = points.shape[0]
    rows = max(pl.cdiv(P, LANE), 1)
    rows = ((rows + _TILE_ROWS - 1) // _TILE_ROWS) * _TILE_ROWS
    pad = rows * LANE - P
    flat = jnp.pad(points, ((0, pad), (0, 0)))
    planes = flat.T.reshape(3, rows, LANE)
    return planes[0], planes[1], planes[2], P


def from_planes(x, y, z, P: int) -> jax.Array:
    """Three (rows, 128) planes -> (P, 3)."""
    flat = jnp.stack([x.reshape(-1), y.reshape(-1), z.reshape(-1)], axis=-1)
    return flat[:P]


def warp_points(
    R: jax.Array, t: jax.Array, points: jax.Array, interpret: bool = False
) -> jax.Array:
    """(P, 3) convenience wrapper: returns R @ p + t per point."""
    rt = jnp.concatenate([R, t[:, None]], axis=1)
    x, y, z, P = to_planes(points)
    xo, yo, zo = warp_points_planes(rt, x, y, z, interpret=interpret)
    return from_planes(xo, yo, zo, P)
