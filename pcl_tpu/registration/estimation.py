"""Rigid-transform estimation from weighted correspondences.

Closed-form estimators, all masked/weighted reductions + small solves that
stay on device:

- estimate_svd: Umeyama SVD (reference: registration/include/pcl/
  registration/impl/transformation_estimation_svd.hpp:137-186)
- estimate_point_to_plane: linearized least squares on the point-to-plane
  metric (reference: transformation_estimation_point_to_plane_lls.hpp),
  solved as a 6x6 normal-equation system. Unlike PCL's small-angle
  construction, the solved twist is mapped through the exact SE(3)
  exponential, so large per-iteration rotations stay rigid.
- estimate_symmetric_point_to_plane: symmetric objective (reference:
  transformation_estimation_symmetric_point_to_plane_lls.h)
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from pcl_tpu.core import geometry
from pcl_tpu.core.transforms import se3_exp

_EPS = 1e-12


def estimate_svd(src: jax.Array, dst: jax.Array, weights: jax.Array) -> jax.Array:
    """Weighted point-to-point closed form (Umeyama). Returns 4x4."""
    return geometry.umeyama(src, dst, weights)


def _solve_normal_equations(JtJ: jax.Array, Jtr: jax.Array) -> jax.Array:
    """Solve 6x6 H x = -g with Tikhonov fallback for degenerate geometry."""
    H = JtJ + 1e-9 * jnp.trace(JtJ) * jnp.eye(6, dtype=JtJ.dtype)
    return jnp.linalg.solve(H, -Jtr)


def point_to_plane_system(
    src: jax.Array,
    dst: jax.Array,
    dst_normals: jax.Array,
    weights: jax.Array,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Accumulate the 6x6 point-to-plane Gauss-Newton system.

    Twist convention (rho, omega) matching transforms.se3_exp:
    residual r_i = n_i . (p_i - q_i);  J_i = [n_i, p_i x n_i].
    Returns (JtJ [6,6], Jtr [6], sse scalar). This reduction is the psum
    target for multi-chip ICP (SURVEY §2.15).
    """
    w = weights.astype(src.dtype)
    n = dst_normals
    r = jnp.sum(n * (src - dst), axis=-1)
    J = jnp.concatenate([n, jnp.cross(src, n)], axis=-1)        # [N,6]
    Jw = J * w[:, None]
    JtJ = J.T @ Jw
    Jtr = Jw.T @ r
    sse = jnp.sum(w * r * r)
    return JtJ, Jtr, sse


def estimate_point_to_plane(
    src: jax.Array,
    dst: jax.Array,
    dst_normals: jax.Array,
    weights: jax.Array,
) -> jax.Array:
    """One Gauss-Newton step on the point-to-plane metric. Returns 4x4."""
    JtJ, Jtr, _ = point_to_plane_system(src, dst, dst_normals, weights)
    xi = _solve_normal_equations(JtJ, Jtr)
    return se3_exp(xi)


def estimate_symmetric_point_to_plane(
    src: jax.Array,
    src_normals: jax.Array,
    dst: jax.Array,
    dst_normals: jax.Array,
    weights: jax.Array,
) -> jax.Array:
    """Symmetric point-to-plane (sum of both normals) per Rusinkiewicz;
    reference: transformation_estimation_symmetric_point_to_plane_lls.h."""
    w = weights.astype(src.dtype)
    n = src_normals + dst_normals
    r = jnp.sum(n * (src - dst), axis=-1)
    mid = 0.5 * (src + dst)
    J = jnp.concatenate([n, jnp.cross(mid, n)], axis=-1)
    Jw = J * w[:, None]
    JtJ = J.T @ Jw
    Jtr = Jw.T @ r
    xi = _solve_normal_equations(JtJ, Jtr)
    return se3_exp(xi)
