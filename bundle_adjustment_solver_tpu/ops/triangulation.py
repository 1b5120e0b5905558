"""Stereo triangulation utilities.

Reference parity: test/test_projection_of_3d_point.cc:38-50 -- disparity ->
depth -> back-projection for a rectified horizontal stereo pair -- promoted
from a printf demo into batched library functions, plus a general midpoint
two-view triangulator the reference lacks.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_HIGHEST = jax.lax.Precision.HIGHEST


def disparity_to_depth(
    disparity: jax.Array, fx: jax.Array, baseline: jax.Array
) -> jax.Array:
    """z = fx * b / d for rectified stereo (test_projection_of_3d_point.cc:40)."""
    return fx * baseline / disparity


def backproject(
    pixel: jax.Array,  # (..., 2)
    depth: jax.Array,  # (...,)
    fx: jax.Array,
    fy: jax.Array,
    cx: jax.Array,
    cy: jax.Array,
) -> jax.Array:
    """Pixel + depth -> camera-frame 3-D point (cc:42-48)."""
    x = (pixel[..., 0] - cx) / fx * depth
    y = (pixel[..., 1] - cy) / fy * depth
    return jnp.stack([x, y, depth], axis=-1)


def triangulate_stereo(
    pixel_left: jax.Array,  # (..., 2)
    pixel_right: jax.Array,  # (..., 2)
    fx: jax.Array,
    fy: jax.Array,
    cx: jax.Array,
    cy: jax.Array,
    baseline: jax.Array,
) -> jax.Array:
    """Rectified-stereo triangulation: disparity = u_l - u_r (cc:38-50).

    Returns left-camera-frame points (..., 3).
    """
    disparity = pixel_left[..., 0] - pixel_right[..., 0]
    depth = disparity_to_depth(disparity, fx, baseline)
    return backproject(pixel_left, depth, fx, fy, cx, cy)


def triangulate_two_view(
    R1: jax.Array, t1: jax.Array,  # world->camera-1 (..., 3, 3), (..., 3)
    R2: jax.Array, t2: jax.Array,  # world->camera-2
    ray1: jax.Array,  # (..., 3) unit-depth camera-1 ray (x/z, y/z, 1)
    ray2: jax.Array,  # (..., 3)
) -> jax.Array:
    """General midpoint triangulation for arbitrary two-view geometry.

    Solves min over (s, u) of | (o1 + s d1) - (o2 + u d2) |^2 where o_k / d_k
    are camera centers and world-frame ray directions; returns the midpoint.
    """
    R1t = jnp.swapaxes(R1, -1, -2)
    R2t = jnp.swapaxes(R2, -1, -2)
    o1 = -jnp.einsum("...ij,...j->...i", R1t, t1, precision=_HIGHEST)
    o2 = -jnp.einsum("...ij,...j->...i", R2t, t2, precision=_HIGHEST)
    d1 = jnp.einsum("...ij,...j->...i", R1t, ray1, precision=_HIGHEST)
    d2 = jnp.einsum("...ij,...j->...i", R2t, ray2, precision=_HIGHEST)

    a = jnp.sum(d1 * d1, axis=-1)
    b = jnp.sum(d1 * d2, axis=-1)
    c = jnp.sum(d2 * d2, axis=-1)
    w0 = o1 - o2
    d = jnp.sum(d1 * w0, axis=-1)
    e = jnp.sum(d2 * w0, axis=-1)
    denom = a * c - b * b
    denom = jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
    s = (b * e - c * d) / denom
    u = (a * e - b * d) / denom
    p1 = o1 + s[..., None] * d1
    p2 = o2 + u[..., None] * d2
    return 0.5 * (p1 + p2)
