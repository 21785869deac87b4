"""B-spline surface / curve fitting — the NURBS-fitting capability slice.

Re-design of the reference's ``on_nurbs`` module surface (reference:
surface/include/pcl/surface/on_nurbs/fitting_surface_tdm.h,
fitting_curve_2d.h — least-squares B-spline fitting with smoothness
regularization over the vendored opennurbs kernel). The reference builds
sparse normal equations point-by-point and solves with a sparse LU; here
the whole system is BATCHED: every point's basis-function row is computed
in one vectorized pass (cubic uniform B-splines), the normal equations
assemble as one [P, C] -> [C, C] matmul on the MXU, and a thin-plate
smoothing term regularizes unsupported control points. No opennurbs: the
evaluation basis is the standard uniform cubic B-spline, which covers the
fitting/evaluation API the reference's examples exercise (closed curves,
open surfaces); trimming/IO of full NURBS objects stays out of scope.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pcl_tpu.core.cloud import Cloud


def _cubic_basis(t: jax.Array) -> jax.Array:
    """Uniform cubic B-spline basis weights for fractional position t in
    [0,1): returns [.., 4] weights for control points i-1..i+2."""
    t2 = t * t
    t3 = t2 * t
    b0 = (1 - t) ** 3 / 6.0
    b1 = (3 * t3 - 6 * t2 + 4) / 6.0
    b2 = (-3 * t3 + 3 * t2 + 3 * t + 1) / 6.0
    b3 = t3 / 6.0
    return jnp.stack([b0, b1, b2, b3], axis=-1)


class BSplineSurface(NamedTuple):
    control: jax.Array   # [Gu, Gv] control heights (z over the (u,v) grid)
    origin: jax.Array    # [2] (u,v) domain min
    scale: jax.Array     # [2] domain extent
    frame: jax.Array     # [3,3] local frame (rows: u axis, v axis, normal)
    centroid: jax.Array  # [3]


def _uv_cells(uv: jax.Array, gu: int, gv: int):
    """Map normalized (u,v) in [0,1] to cell indices + fractions with
    clamped boundary cells."""
    pu = jnp.clip(uv[:, 0] * (gu - 3), 0.0, gu - 3 - 1e-6)
    pv = jnp.clip(uv[:, 1] * (gv - 3), 0.0, gv - 3 - 1e-6)
    iu = jnp.floor(pu).astype(jnp.int32)
    iv = jnp.floor(pv).astype(jnp.int32)
    return iu, pu - iu, iv, pv - iv


@partial(jax.jit, static_argnames=("grid_u", "grid_v"))
def fit_bspline_surface(
    cloud: Cloud,
    grid_u: int = 10,
    grid_v: int = 10,
    smoothness: float = 1e-3,
) -> BSplineSurface:
    """Least-squares fit of a cubic B-spline height field over the cloud's
    dominant plane (the open-surface case of the reference's
    FittingSurface; its iterative TDM refinement reduces to one linear
    solve for a height-field parameterization).

    The local frame comes from the masked PCA of the cloud; heights along
    the smallest eigenvector are regressed on [grid_u x grid_v] control
    points with a Laplacian smoothness prior (ridge on unsupported
    regions).
    """
    xyz, m = cloud.xyz, cloud.mask
    w = m.astype(jnp.float32)
    n = jnp.maximum(w.sum(), 1.0)
    mu = (xyz * w[:, None]).sum(0) / n
    d = (xyz - mu) * w[:, None]
    cov = d.T @ d / n
    lam, V = jnp.linalg.eigh(cov)          # ascending
    frame = V[:, ::-1].T                   # rows: major, mid, normal
    local = (xyz - mu) @ frame.T           # [N,3] (u, v, h)
    lo = jnp.min(jnp.where(m[:, None], local[:, :2], jnp.inf), axis=0)
    hi = jnp.max(jnp.where(m[:, None], local[:, :2], -jnp.inf), axis=0)
    scale = jnp.maximum(hi - lo, 1e-9)
    uv = (local[:, :2] - lo) / scale

    gu, gv = grid_u, grid_v
    iu, tu, iv, tv = _uv_cells(uv, gu, gv)
    bu = _cubic_basis(tu)                  # [N,4]
    bv = _cubic_basis(tv)                  # [N,4]
    C = gu * gv
    # dense design matrix A [N, C] (16 basis products per row; the
    # reference assembles the same normal equations sparsely point-by-
    # point — C is small, so A^T A is one MXU matmul)
    cols = []
    vals = []
    for a in range(4):
        for b in range(4):
            cols.append((iu + a) * gv + (iv + b))
            vals.append(bu[:, a] * bv[:, b] * w)
    cols = jnp.stack(cols, axis=1)         # [N,16]
    vals = jnp.stack(vals, axis=1)         # [N,16]
    A = jnp.zeros((xyz.shape[0], C), jnp.float32)
    for a in range(16):
        A = A.at[jnp.arange(xyz.shape[0]), cols[:, a]].add(vals[:, a])
    AtA = A.T @ A
    Atb = A.T @ (local[:, 2] * w)
    # Laplacian smoothness prior over the control grid
    idx = jnp.arange(C).reshape(gu, gv)
    Lrows = []
    for du, dv in ((1, 0), (0, 1)):
        a = idx[: gu - du, : gv - dv].reshape(-1)
        b = idx[du:, dv:].reshape(-1)
        Lrows.append((a, b))
    Lap = jnp.zeros((C, C), jnp.float32)
    for a, b in Lrows:
        Lap = Lap.at[a, a].add(1.0).at[b, b].add(1.0)
        Lap = Lap.at[a, b].add(-1.0).at[b, a].add(-1.0)
    reg = smoothness * jnp.maximum(n / C, 1.0)
    ctrl = jnp.linalg.solve(AtA + reg * Lap + 1e-6 * jnp.eye(C), Atb)
    return BSplineSurface(control=ctrl.reshape(gu, gv),
                          origin=lo, scale=scale, frame=frame, centroid=mu)


@jax.jit
def eval_bspline_surface(surf: BSplineSurface, uv: jax.Array) -> jax.Array:
    """Evaluate the fitted surface at [M,2] normalized (u,v) in [0,1];
    returns [M,3] world-space points."""
    gu, gv = surf.control.shape
    iu, tu, iv, tv = _uv_cells(uv, gu, gv)
    bu = _cubic_basis(tu)
    bv = _cubic_basis(tv)
    h = jnp.zeros(uv.shape[0], jnp.float32)
    for a in range(4):
        for b in range(4):
            h = h + bu[:, a] * bv[:, b] * surf.control[
                jnp.clip(iu + a, 0, gu - 1), jnp.clip(iv + b, 0, gv - 1)]
    u = surf.origin[0] + uv[:, 0] * surf.scale[0]
    v = surf.origin[1] + uv[:, 1] * surf.scale[1]
    local = jnp.stack([u, v, h], axis=1)
    return local @ surf.frame + surf.centroid


class BSplineCurve2D(NamedTuple):
    control: jax.Array   # [G, 2] control points (closed: wraps mod G)


@partial(jax.jit, static_argnames=("n_control",))
def fit_bspline_curve2d(
    points: jax.Array,
    mask: jax.Array,
    n_control: int = 12,
    smoothness: float = 1e-2,
) -> BSplineCurve2D:
    """Closed cubic B-spline curve fit to 2-D points (the reference's
    FittingCurve2d / closed-curve examples): points are parameterized by
    angle around the centroid, control points solved in closed form with
    a second-difference smoothness prior."""
    w = mask.astype(jnp.float32)
    n = jnp.maximum(w.sum(), 1.0)
    mu = (points * w[:, None]).sum(0) / n
    d = points - mu
    theta = jnp.arctan2(d[:, 1], d[:, 0])
    t = (theta / (2 * jnp.pi) + 0.5) * n_control   # [0, G)
    i0 = jnp.floor(t).astype(jnp.int32)
    f = t - i0
    B = _cubic_basis(f)                             # [N,4]
    G = n_control
    A = jnp.zeros((points.shape[0], G), jnp.float32)
    for a in range(4):
        A = A.at[jnp.arange(points.shape[0]),
                 jnp.mod(i0 + a - 1, G)].add(B[:, a] * w)
    AtA = A.T @ A
    # periodic second-difference smoothing
    ii = jnp.arange(G)
    D = (jnp.eye(G) * 2.0
         - jnp.eye(G)[jnp.mod(ii + 1, G)]
         - jnp.eye(G)[jnp.mod(ii - 1, G)])
    reg = smoothness * jnp.maximum(n / G, 1.0)
    M = AtA + reg * (D.T @ D) + 1e-6 * jnp.eye(G)
    ctrl = jnp.linalg.solve(M, A.T @ (points * w[:, None]))
    return BSplineCurve2D(control=ctrl)


@jax.jit
def eval_bspline_curve2d(curve: BSplineCurve2D, t: jax.Array) -> jax.Array:
    """Evaluate the closed curve at parameters t in [0,1) -> [M,2]."""
    G = curve.control.shape[0]
    s = t * G
    i0 = jnp.floor(s).astype(jnp.int32)
    B = _cubic_basis(s - i0)
    out = jnp.zeros((t.shape[0], 2), jnp.float32)
    for a in range(4):
        out = out + B[:, a:a + 1] * curve.control[jnp.mod(i0 + a - 1, G)]
    return out
