"""Lane-form batched 3x3 linear algebra — [9, N] layout with N in lanes.

A ``[N, 3, 3]`` tensor is poison on TPU: the minor dims (3, 3) pad to one
(8 sublane, 128 lane) tile per matrix — 4 KB of HBM for 36 real bytes.
Every GICP/NDT-style per-point covariance op (inverse, sandwich products,
Mahalanobis forms) then runs ~100x memory-inflated.

This module keeps batches of 3x3 matrices as ``[9, N]`` (row-major entries
on the MAJOR axis, the batch on the lane axis) and batches of vectors as
``[3, N]``. Each algebraic op becomes a handful of fused [N]-vector
multiply-adds — the layout the VPU actually wants. Closed-form adjugate
inverses replace ``jnp.linalg.inv`` (no batched LU).

Consumers: registration/gicp.py (per-pair Mahalanobis IRLS). Reference
counterpart: the SSE-blocked Eigen loops in gicp.hpp:346-353.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def to_lanes(C: jax.Array) -> jax.Array:
    """[N,3,3] -> [9,N] (row-major entries major, batch in lanes)."""
    return C.reshape(C.shape[0], 9).T


def from_lanes(L: jax.Array) -> jax.Array:
    """[9,N] -> [N,3,3]."""
    return L.T.reshape(L.shape[1], 3, 3)


def vec_to_lanes(v: jax.Array) -> jax.Array:
    """[N,3] -> [3,N]."""
    return v.T


def vec_from_lanes(V: jax.Array) -> jax.Array:
    """[3,N] -> [N,3]."""
    return V.T


def matmul(A: jax.Array, B: jax.Array) -> jax.Array:
    """[9,N] @ [9,N] -> [9,N] per-lane 3x3 product (27 fused MACs)."""
    out = []
    for i in range(3):
        for j in range(3):
            out.append(A[3 * i + 0] * B[0 + j]
                       + A[3 * i + 1] * B[3 + j]
                       + A[3 * i + 2] * B[6 + j])
    return jnp.stack(out)


def matvec(A: jax.Array, x: jax.Array) -> jax.Array:
    """[9,N] x [3,N] -> [3,N]."""
    return jnp.stack([
        A[0] * x[0] + A[1] * x[1] + A[2] * x[2],
        A[3] * x[0] + A[4] * x[1] + A[5] * x[2],
        A[6] * x[0] + A[7] * x[1] + A[8] * x[2],
    ])


def transpose(A: jax.Array) -> jax.Array:
    """Per-lane matrix transpose (pure index shuffle on the major axis)."""
    return A[jnp.asarray([0, 3, 6, 1, 4, 7, 2, 5, 8])]


def sandwich(R: jax.Array, C: jax.Array) -> jax.Array:
    """R C R^T with a SINGLE replicated [3,3] R and per-lane C [9,N].

    81 scalar-weighted MACs over [N] lanes — the rotated source covariance
    of GICP (gicp.hpp:180: C_s' = R C_s R^T)."""
    out = []
    for i in range(3):
        for j in range(3):
            acc = None
            for a in range(3):
                for b in range(3):
                    term = (R[i, a] * R[j, b]) * C[3 * a + b]
                    acc = term if acc is None else acc + term
            out.append(acc)
    return jnp.stack(out)


def add_scaled_identity(C: jax.Array, s) -> jax.Array:
    """C + s*I per lane."""
    s = jnp.asarray(s, C.dtype)
    return C.at[jnp.asarray([0, 4, 8])].add(s)


def det(A: jax.Array) -> jax.Array:
    """[9,N] -> [N] determinants."""
    return (A[0] * (A[4] * A[8] - A[5] * A[7])
            - A[1] * (A[3] * A[8] - A[5] * A[6])
            + A[2] * (A[3] * A[7] - A[4] * A[6]))


def inv(A: jax.Array, eps: float = 1e-30) -> jax.Array:
    """Closed-form adjugate inverse [9,N] -> [9,N] (det clamped by eps)."""
    c00 = A[4] * A[8] - A[5] * A[7]
    c01 = A[5] * A[6] - A[3] * A[8]
    c02 = A[3] * A[7] - A[4] * A[6]
    d = A[0] * c00 + A[1] * c01 + A[2] * c02
    rd = 1.0 / jnp.where(jnp.abs(d) > eps, d, jnp.where(d >= 0, eps, -eps))
    return jnp.stack([
        c00 * rd,
        (A[2] * A[7] - A[1] * A[8]) * rd,
        (A[1] * A[5] - A[2] * A[4]) * rd,
        c01 * rd,
        (A[0] * A[8] - A[2] * A[6]) * rd,
        (A[2] * A[3] - A[0] * A[5]) * rd,
        c02 * rd,
        (A[1] * A[6] - A[0] * A[7]) * rd,
        (A[0] * A[4] - A[1] * A[3]) * rd,
    ])


def quadform(M: jax.Array, x: jax.Array) -> jax.Array:
    """x^T M x per lane: [9,N], [3,N] -> [N]."""
    Mx = matvec(M, x)
    return x[0] * Mx[0] + x[1] * Mx[1] + x[2] * Mx[2]


def scale(A: jax.Array, w: jax.Array) -> jax.Array:
    """Per-lane scalar scale: [9,N] * [N] -> [9,N]."""
    return A * w[None, :]


def gather(A: jax.Array, idx: jax.Array) -> jax.Array:
    """Lane gather: [9,N], [Q] int -> [9,Q] (A[:, idx])."""
    return A[:, idx]
