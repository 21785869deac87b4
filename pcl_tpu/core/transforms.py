"""Rigid transforms and SE(3)/SO(3) utilities.

TPU-native equivalent of reference common/include/pcl/common/transforms.h:59
(transformPointCloud / transformPointCloudWithNormals) plus the Lie-group
machinery (se3 exp/log) that pcl_tpu's Gauss-Newton registration loops use in
place of PCL's Euler-angle parameterizations (reference:
registration/include/pcl/registration/warp_point_rigid_6d.h).

Transforms are 4x4 float32 homogeneous matrices; functions accept leading
batch dimensions everywhere.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from pcl_tpu.core.cloud import Cloud, ATTR_NORMAL

_EPS = 1e-9


def identity(dtype=jnp.float32) -> jax.Array:
    return jnp.eye(4, dtype=dtype)


def from_rt(R: jax.Array, t: jax.Array) -> jax.Array:
    T = jnp.zeros(R.shape[:-2] + (4, 4), R.dtype)
    T = T.at[..., :3, :3].set(R)
    T = T.at[..., :3, 3].set(t)
    T = T.at[..., 3, 3].set(1.0)
    return T


def invert_rigid(T: jax.Array) -> jax.Array:
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    return from_rt(Rt, -jnp.einsum("...ij,...j->...i", Rt, t))


def transform_points(T: jax.Array, xyz: jax.Array) -> jax.Array:
    """Apply [...,4,4] to [...,N,3]."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    return jnp.einsum("...ij,...nj->...ni", R, xyz) + t[..., None, :]


def transform_cloud(T: jax.Array, cloud: Cloud) -> Cloud:
    """Transform positions and rotate any 'normal' attribute
    (reference: transformPointCloudWithNormals, common/impl/transforms.hpp)."""
    xyz = transform_points(T, cloud.xyz)
    xyz = jnp.where(cloud.mask[..., None], xyz, 0.0)
    out = cloud.with_xyz(xyz)
    if ATTR_NORMAL in cloud.attrs:
        R = T[..., :3, :3]
        n = jnp.einsum("...ij,...nj->...ni", R, cloud.attrs[ATTR_NORMAL])
        n = jnp.where(cloud.mask[..., None], n, 0.0)
        out = out.with_attrs(**{ATTR_NORMAL: n})
    return out


# ---------------------------------------------------------------------------
# SO(3)
# ---------------------------------------------------------------------------

def hat(w: jax.Array) -> jax.Array:
    """[...,3] -> [...,3,3] skew-symmetric."""
    zero = jnp.zeros_like(w[..., 0])
    return jnp.stack(
        [
            jnp.stack([zero, -w[..., 2], w[..., 1]], axis=-1),
            jnp.stack([w[..., 2], zero, -w[..., 0]], axis=-1),
            jnp.stack([-w[..., 1], w[..., 0], zero], axis=-1),
        ],
        axis=-2,
    )


def so3_exp(w: jax.Array) -> jax.Array:
    """Rodrigues: [...,3] axis-angle -> [...,3,3] rotation.

    The small-angle branch substitutes theta2=1 into the generic expressions
    (not just a floor) so that second-order autodiff — jax.hessian through
    registration objectives at xi=0 — never differentiates 1/theta terms at
    the origin (the where-branch NaN trap)."""
    theta2 = jnp.sum(w * w, axis=-1)
    small = theta2 < 1e-8
    safe2 = jnp.where(small, 1.0, theta2)
    theta = jnp.sqrt(safe2)
    # Taylor-safe coefficients
    A = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    B = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / safe2)
    W = hat(w)
    W2 = W @ W
    I = jnp.eye(3, dtype=w.dtype)
    return I + A[..., None, None] * W + B[..., None, None] * W2


def so3_log(R: jax.Array) -> jax.Array:
    """[...,3,3] rotation -> [...,3] axis-angle (theta in [0, pi])."""
    tr = jnp.trace(R, axis1=-2, axis2=-1)
    cos_t = jnp.clip((tr - 1.0) * 0.5, -1.0, 1.0)
    theta = jnp.arccos(cos_t)
    v = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    sin_t = jnp.sin(theta)
    small = theta < 1e-4
    near_pi = theta > jnp.pi - 1e-3
    scale = jnp.where(small, 0.5 + theta * theta / 12.0, theta / jnp.maximum(2.0 * sin_t, _EPS))
    w_generic = v * scale[..., None]
    # near pi: use diagonal-based extraction
    d = jnp.stack([R[..., 0, 0], R[..., 1, 1], R[..., 2, 2]], axis=-1)
    axis2 = jnp.maximum((d - cos_t[..., None]) / jnp.maximum(1.0 - cos_t[..., None], _EPS), 0.0)
    axis = jnp.sqrt(axis2)
    # fix signs from off-diagonal sums
    s0 = R[..., 2, 1] - R[..., 1, 2]
    s1 = R[..., 0, 2] - R[..., 2, 0]
    s2 = R[..., 1, 0] - R[..., 0, 1]
    sign = jnp.stack([jnp.sign(s0), jnp.sign(s1), jnp.sign(s2)], axis=-1)
    # near pi sin(theta)~0, sign of v unreliable; use off-diag products instead
    k = jnp.argmax(axis, axis=-1)
    sgn = jnp.sign(jnp.where(sign == 0, 1.0, sign))
    axis_signed = axis * sgn
    # ensure consistency via largest component positive then off-diag products
    off = jnp.stack(
        [R[..., 0, 1] + R[..., 1, 0], R[..., 0, 2] + R[..., 2, 0], R[..., 1, 2] + R[..., 2, 1]],
        axis=-1,
    )  # [xy, xz, yz]

    def fix_near_pi(axis, off, k):
        ax, ay, az = axis[..., 0], axis[..., 1], axis[..., 2]
        sxy, sxz, syz = jnp.sign(off[..., 0]), jnp.sign(off[..., 1]), jnp.sign(off[..., 2])
        sxy = jnp.where(sxy == 0, 1.0, sxy)
        sxz = jnp.where(sxz == 0, 1.0, sxz)
        syz = jnp.where(syz == 0, 1.0, syz)
        # anchor the largest axis component positive, derive the others' signs
        cand0 = jnp.stack([ax, ay * sxy, az * sxz], axis=-1)   # anchor x
        cand1 = jnp.stack([ax * sxy, ay, az * syz], axis=-1)   # anchor y
        cand2 = jnp.stack([ax * sxz, ay * syz, az], axis=-1)   # anchor z
        cands = jnp.stack([cand0, cand1, cand2], axis=-2)
        return jnp.take_along_axis(cands, k[..., None, None], axis=-2)[..., 0, :]

    w_pi = fix_near_pi(axis, off, k) * theta[..., None]
    return jnp.where(near_pi[..., None], w_pi, w_generic)


# ---------------------------------------------------------------------------
# SE(3)
# ---------------------------------------------------------------------------

def se3_exp(xi: jax.Array) -> jax.Array:
    """Twist [...,6] (rho, omega) -> [...,4,4]."""
    rho, w = xi[..., :3], xi[..., 3:]
    theta2 = jnp.sum(w * w, axis=-1)
    small = theta2 < 1e-8
    safe2 = jnp.where(small, 1.0, theta2)   # autodiff-safe (see so3_exp)
    theta = jnp.sqrt(safe2)
    A = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    B = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / safe2)
    C = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0, (1.0 - A) / safe2)
    W = hat(w)
    W2 = W @ W
    I = jnp.eye(3, dtype=xi.dtype)
    R = I + A[..., None, None] * W + B[..., None, None] * W2
    V = I + B[..., None, None] * W + C[..., None, None] * W2
    t = jnp.einsum("...ij,...j->...i", V, rho)
    return from_rt(R, t)


def se3_log(T: jax.Array) -> jax.Array:
    """[...,4,4] -> twist [...,6] (rho, omega)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    w = so3_log(R)
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, _EPS * _EPS))
    small = theta2 < 1e-12
    A = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    B = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    W = hat(w)
    W2 = W @ W
    I = jnp.eye(3, dtype=T.dtype)
    # V^{-1} = I - W/2 + (1/theta^2)(1 - A/(2B)) W^2
    coef = jnp.where(
        small,
        1.0 / 12.0 + theta2 / 720.0,
        (1.0 - A / (2.0 * B)) / jnp.maximum(theta2, _EPS),
    )
    Vinv = I - 0.5 * W + coef[..., None, None] * W2
    rho = jnp.einsum("...ij,...j->...i", Vinv, t)
    return jnp.concatenate([rho, w], axis=-1)


def rotation_angle(R: jax.Array) -> jax.Array:
    """Rotation magnitude in radians."""
    tr = jnp.trace(R, axis1=-2, axis2=-1)
    return jnp.arccos(jnp.clip((tr - 1.0) * 0.5, -1.0, 1.0))


# ---------------------------------------------------------------------------
# Quaternions (wxyz convention)
# ---------------------------------------------------------------------------

def quat_to_matrix(q: jax.Array) -> jax.Array:
    q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), _EPS)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], axis=-1),
            jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], axis=-1),
            jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], axis=-1),
        ],
        axis=-2,
    )


def matrix_to_quat(R: jax.Array) -> jax.Array:
    """Robust rotation-matrix -> quaternion (wxyz), branch-free via the
    four-candidate method."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tw = 1.0 + m00 + m11 + m22
    tx = 1.0 + m00 - m11 - m22
    ty = 1.0 - m00 + m11 - m22
    tz = 1.0 - m00 - m11 + m22
    qw = jnp.stack([tw, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    qx = jnp.stack([m21 - m12, tx, m01 + m10, m02 + m20], axis=-1)
    qy = jnp.stack([m02 - m20, m01 + m10, ty, m12 + m21], axis=-1)
    qz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, tz], axis=-1)
    traces = jnp.stack([tw, tx, ty, tz], axis=-1)
    k = jnp.argmax(traces, axis=-1)
    cands = jnp.stack([qw, qx, qy, qz], axis=-2)
    q = jnp.take_along_axis(cands, k[..., None, None], axis=-2)[..., 0, :]
    q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), _EPS)
    return q * jnp.sign(jnp.where(q[..., :1] == 0, 1.0, q[..., :1]))
