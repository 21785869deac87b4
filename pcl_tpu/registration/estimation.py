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


# ---------------------------------------------------------------------------
# Additional closed-form / iterative estimators
# ---------------------------------------------------------------------------

def _quat_left(q):
    """Left-multiplication matrix L(q): L(q) p = q * p (w,x,y,z order)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack([
        jnp.stack([w, -x, -y, -z], -1),
        jnp.stack([x,  w, -z,  y], -1),
        jnp.stack([y,  z,  w, -x], -1),
        jnp.stack([z, -y,  x,  w], -1),
    ], -2)


def _quat_right(q):
    """Right-multiplication matrix R(q): R(q) p = p * q."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack([
        jnp.stack([w, -x, -y, -z], -1),
        jnp.stack([x,  w,  z, -y], -1),
        jnp.stack([y, -z,  w,  x], -1),
        jnp.stack([z,  y, -x,  w], -1),
    ], -2)


def estimate_dual_quaternion(src: jax.Array, dst: jax.Array, weights: jax.Array) -> jax.Array:
    """Walker et al. dual-quaternion closed form (reference:
    transformation_estimation_dual_quaternion.hpp:139-220 — C1/C2
    accumulation, A = (0.25/n) C2'C2 - C1, rotation = top eigenvector,
    translation from the dual part). Weighted generalization: sums are
    weighted and n -> sum(w). Quaternion layout here is (x,y,z,w)."""
    w = weights.astype(src.dtype)
    n_w = jnp.maximum(jnp.sum(w), _EPS)
    ax, ay, az = src[:, 0], src[:, 1], src[:, 2]
    bx, by, bz = dst[:, 0], dst[:, 1], dst[:, 2]

    def S(expr):
        return jnp.sum(w * expr)

    axbx, ayby, azbz = S(ax * bx), S(ay * by), S(az * bz)
    axby, aybx = S(ax * by), S(ay * bx)
    axbz, azbx = S(ax * bz), S(az * bx)
    aybz, azby = S(ay * bz), S(az * by)
    C1 = jnp.asarray([
        [axbx - azbz - ayby, axby + aybx,        axbz + azbx,        aybz - azby],
        [axby + aybx,        ayby - azbz - axbx, azby + aybz,        azbx - axbz],
        [axbz + azbx,        azby + aybz,        azbz - axbx - ayby, axby - aybx],
        [aybz - azby,        azbx - axbz,        axby - aybx,        axbx + ayby + azbz],
    ], dtype=src.dtype) * (-2.0)
    sxp = jnp.stack([S(ax + bx), S(ay + by), S(az + bz)])   # sums a+b
    sxm = jnp.stack([S(ax - bx), S(ay - by), S(az - bz)])   # sums a-b
    C2 = jnp.asarray([
        [0.0, 0.0, 0.0, 0.0],
        [0.0, 0.0, 0.0, 0.0],
        [0.0, 0.0, 0.0, 0.0],
        [0.0, 0.0, 0.0, 0.0],
    ], dtype=src.dtype)
    C2 = C2.at[1, 0].set(sxp[2]).at[0, 1].set(-sxp[2])
    C2 = C2.at[2, 0].set(-sxp[1]).at[0, 2].set(sxp[1])
    C2 = C2.at[3, 0].set(sxm[0]).at[0, 3].set(-sxm[0])
    C2 = C2.at[2, 1].set(sxp[0]).at[1, 2].set(-sxp[0])
    C2 = C2.at[3, 1].set(sxm[1]).at[1, 3].set(-sxm[1])
    C2 = C2.at[3, 2].set(sxm[2]).at[2, 3].set(-sxm[2])
    C2 = C2 * 2.0

    A = (0.25 / n_w) * C2.T @ C2 - C1
    _, evecs = jnp.linalg.eigh(A)
    q = evecs[:, -1]                                  # (x,y,z,w)
    s = -(0.5 / n_w) * C2 @ q
    # t = s * conj(q); translation = -vec(t)
    qw = jnp.concatenate([q[3:4], q[:3]])             # (w,x,y,z)
    sw = jnp.concatenate([s[3:4], s[:3]])
    q_conj = qw * jnp.asarray([1.0, -1.0, -1.0, -1.0], qw.dtype)
    t_q = _quat_left(sw) @ q_conj
    from pcl_tpu.core.transforms import quat_to_matrix, from_rt
    R = quat_to_matrix(qw)
    return from_rt(R, -t_q[1:4])


def estimate_2d(src: jax.Array, dst: jax.Array, weights: jax.Array) -> jax.Array:
    """Rigid 2D (x, y, yaw) closed form, z passes through (reference:
    transformation_estimation_2D.hpp — projects to z=0, SVD in 2D)."""
    w = weights.astype(src.dtype)
    s = jnp.maximum(jnp.sum(w), _EPS)
    mu_s = jnp.sum(w[:, None] * src[:, :2], axis=0) / s
    mu_d = jnp.sum(w[:, None] * dst[:, :2], axis=0) / s
    a = src[:, :2] - mu_s
    b = dst[:, :2] - mu_d
    # theta maximizing sum w * cos(theta - phi_i): closed form via sums
    c = jnp.sum(w * (a[:, 0] * b[:, 0] + a[:, 1] * b[:, 1]))
    sgn = jnp.sum(w * (a[:, 0] * b[:, 1] - a[:, 1] * b[:, 0]))
    theta = jnp.arctan2(sgn, c)
    ct, st = jnp.cos(theta), jnp.sin(theta)
    R2 = jnp.stack([jnp.stack([ct, -st]), jnp.stack([st, ct])])
    t2 = mu_d - R2 @ mu_s
    # mean z offset (the reference keeps z fixed; we match z means so the
    # estimate is usable on slightly non-planar data)
    dz = jnp.sum(w * (dst[:, 2] - src[:, 2])) / s
    T = jnp.eye(4, dtype=src.dtype)
    T = T.at[:2, :2].set(R2)
    T = T.at[:2, 3].set(t2)
    T = T.at[2, 3].set(dz)
    return T


def estimate_3point(src3: jax.Array, dst3: jax.Array) -> jax.Array:
    """Exact rigid transform from 3 point pairs (reference:
    transformation_estimation_3point.h) — Umeyama on the minimal sample."""
    w = jnp.ones(src3.shape[:-1], src3.dtype)
    return geometry.umeyama(src3, dst3, w)


# --- Levenberg-Marquardt with warp parameterizations (reference:
#     transformation_estimation_lm.h + warp_point_rigid_*.h) ---------------

def warp_rigid_6d(params: jax.Array) -> jax.Array:
    """[tx,ty,tz, rx,ry,rz] twist -> 4x4 (warp_point_rigid_6d equivalent)."""
    return se3_exp(params)


def warp_rigid_6d_quat(params: jax.Array) -> jax.Array:
    """Reference-exact WarpPointRigid6D parameterization
    (registration/include/pcl/registration/warp_point_rigid_6d.h:77-92):
    ``[tx,ty,tz, qx,qy,qz]`` with the quaternion's w recovered as
    sqrt(1 - |v|^2) then normalized. The default ``warp_rigid_6d`` is the
    se(3) twist instead (the TPU-native LM parameterization); this form
    exists for parity with reference-tuned parameter vectors
    (test/registration/test_warps.cpp golden)."""
    t = params[:3]
    v = params[3:6]
    w2 = 1.0 - jnp.sum(v * v)
    w = jnp.sqrt(jnp.maximum(w2, 0.0))
    q = jnp.concatenate([v, w[None]])                  # x,y,z,w
    q = q / jnp.maximum(jnp.linalg.norm(q), 1e-12)
    x, y, z, qw = q[0], q[1], q[2], q[3]
    R = jnp.stack([
        jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - qw * z),
                   2 * (x * z + qw * y)]),
        jnp.stack([2 * (x * y + qw * z), 1 - 2 * (x * x + z * z),
                   2 * (y * z - qw * x)]),
        jnp.stack([2 * (x * z - qw * y), 2 * (y * z + qw * x),
                   1 - 2 * (x * x + y * y)]),
    ])
    T = jnp.eye(4, dtype=params.dtype)
    T = T.at[:3, :3].set(R)
    T = T.at[:3, 3].set(t)
    return T


def warp_rigid_3d(params: jax.Array) -> jax.Array:
    """[tx, ty, yaw] planar rigid warp (reference: warp_point_rigid_3d.h)."""
    xi = jnp.stack([params[0], params[1], jnp.zeros((), params.dtype),
                    jnp.zeros((), params.dtype), jnp.zeros((), params.dtype),
                    params[2]])
    return se3_exp(xi)


def warp_translation(params: jax.Array) -> jax.Array:
    """[tx, ty, tz] translation-only warp."""
    T = jnp.eye(4, dtype=params.dtype)
    return T.at[:3, 3].set(params)


def estimate_lm(
    src: jax.Array,
    dst: jax.Array,
    weights: jax.Array,
    warp=warp_rigid_6d,
    n_params: int = 6,
    iterations: int = 10,
    init_lambda: float = 1e-3,
) -> jax.Array:
    """Levenberg-Marquardt over a warp parameterization (reference:
    transformation_estimation_lm.hpp — generic functor minimization of
    Euclidean correspondence distances). Jacobians via jax.jacfwd on the
    warp; damping doubles on rejected steps, decays on accepted ones.

    Residuals are the per-axis correspondence deltas (3N of them) rather
    than the reference's scalar distances: the objective (sum of squared
    distances) is identical, but the Jacobian stays full-rank even when all
    offsets are parallel (a pure translation makes scalar-distance rows
    collinear and the normal equations rank-1)."""
    w = weights.astype(src.dtype)
    sw = jnp.sqrt(w)[:, None]

    def residuals(params):
        T = warp(params)
        src_t = src @ T[:3, :3].T + T[:3, 3]
        return ((src_t - dst) * sw).reshape(-1)

    jac = jax.jacfwd(residuals)

    def step(carry, _):
        params, lam, best_cost = carry
        r = residuals(params)
        J = jac(params)                               # [N, P]
        g = J.T @ r
        H = J.T @ J
        Hd = H + lam * jnp.diag(jnp.diag(H)) + 1e-12 * jnp.eye(n_params, dtype=H.dtype)
        dp = jnp.linalg.solve(Hd, -g)
        new_params = params + dp
        new_cost = jnp.sum(residuals(new_params) ** 2)
        accept = new_cost < best_cost
        params = jnp.where(accept, new_params, params)
        lam = jnp.where(accept, lam * 0.5, lam * 4.0)
        best_cost = jnp.where(accept, new_cost, best_cost)
        return (params, lam, best_cost), None

    p0 = jnp.zeros((n_params,), src.dtype)
    cost0 = jnp.sum(residuals(p0) ** 2)
    (params, _, _), _ = jax.lax.scan(
        step, (p0, jnp.asarray(init_lambda, src.dtype), cost0), None, length=iterations)
    return warp(params)
