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


@partial(jax.jit, static_argnames=("grid_u", "grid_v", "iterations",
                                   "refine_steps"))
def fit_bspline_surface_iterated(
    cloud: Cloud,
    grid_u: int = 10,
    grid_v: int = 10,
    interior_smoothness: float = 1e-3,
    boundary_smoothness: float = 1e-1,
    iterations: int = 3,
    refine_steps: int = 2,
) -> BSplineSurface:
    """Iterated PDM surface fitting (reference: surface/include/pcl/surface/
    on_nurbs/fitting_surface_pdm.h:46 — FittingSurface::assemble/solve
    repeated with point re-parameterization, with separate
    interior/boundary smoothness weights).

    Each outer iteration: (1) solve the regularized least-squares system
    for the control grid, (2) re-parameterize every point by Gauss-Newton
    steps of (u,v) minimizing its distance TO THE CURRENT SURFACE (the
    'PDM' in the reference's name — inverseMapping in
    fitting_surface_pdm.h), and re-assemble. Boundary control points
    (outermost ring of the grid) carry ``boundary_smoothness``
    regularization; interior ones ``interior_smoothness`` — the
    reference's setInvMapParams/interior_weight/boundary_weight split.
    """
    xyz, m = cloud.xyz, cloud.mask
    w = m.astype(jnp.float32)
    n = jnp.maximum(w.sum(), 1.0)
    mu = (xyz * w[:, None]).sum(0) / n
    d = (xyz - mu) * w[:, None]
    cov = d.T @ d / n
    lam, V = jnp.linalg.eigh(cov)
    frame = V[:, ::-1].T
    local = (xyz - mu) @ frame.T
    lo = jnp.min(jnp.where(m[:, None], local[:, :2], jnp.inf), axis=0)
    hi = jnp.max(jnp.where(m[:, None], local[:, :2], -jnp.inf), axis=0)
    scale = jnp.maximum(hi - lo, 1e-9)
    uv0 = (local[:, :2] - lo) / scale

    gu, gv = grid_u, grid_v
    C = gu * gv
    idx = jnp.arange(C).reshape(gu, gv)
    Lap = jnp.zeros((C, C), jnp.float32)
    for du, dv in ((1, 0), (0, 1)):
        a = idx[: gu - du, : gv - dv].reshape(-1)
        b = idx[du:, dv:].reshape(-1)
        Lap = Lap.at[a, a].add(1.0).at[b, b].add(1.0)
        Lap = Lap.at[a, b].add(-1.0).at[b, a].add(-1.0)
    # split regularization: boundary ring vs interior
    on_boundary = jnp.zeros((gu, gv), bool)
    on_boundary = on_boundary.at[0, :].set(True).at[-1, :].set(True)
    on_boundary = on_boundary.at[:, 0].set(True).at[:, -1].set(True)
    wreg = jnp.where(on_boundary.reshape(-1), boundary_smoothness,
                     interior_smoothness) * jnp.maximum(n / C, 1.0)
    R = Lap * jnp.sqrt(wreg[None, :] * wreg[:, None]) + 1e-6 * jnp.eye(C)

    def solve(uv):
        iu, tu, iv, tv = _uv_cells(uv, gu, gv)
        bu = _cubic_basis(tu)
        bv = _cubic_basis(tv)
        A = jnp.zeros((xyz.shape[0], C), jnp.float32)
        for a in range(4):
            for b in range(4):
                A = A.at[jnp.arange(xyz.shape[0]),
                         (iu + a) * gv + (iv + b)].add(
                    bu[:, a] * bv[:, b] * w)
        ctrl = jnp.linalg.solve(A.T @ A + R, A.T @ (local[:, 2] * w))
        return ctrl

    def height(ctrl, uv):
        iu, tu, iv, tv = _uv_cells(uv, gu, gv)
        bu = _cubic_basis(tu)
        bv = _cubic_basis(tv)
        cg = ctrl.reshape(gu, gv)
        h = jnp.zeros(uv.shape[0], jnp.float32)
        for a in range(4):
            for b in range(4):
                h = h + bu[:, a] * bv[:, b] * cg[
                    jnp.clip(iu + a, 0, gu - 1), jnp.clip(iv + b, 0, gv - 1)]
        return h

    def reparam(ctrl, uv):
        """Gauss-Newton (u,v) refinement minimizing the 3-D distance of
        each point to the surface patch (inverseMapping analog)."""
        target_h = local[:, 2]

        def err(uvq):
            # residual in local coords: (du, dv, dh) weighted by scale
            h = height(ctrl, uvq)
            ru = (uvq[:, 0] - uv0[:, 0]) * scale[0]
            rv = (uvq[:, 1] - uv0[:, 1]) * scale[1]
            rh = h - target_h
            return ru * ru + rv * rv + rh * rh

        cur = uv
        for _ in range(refine_steps):
            g = jax.grad(lambda q: jnp.sum(err(q)))(cur)
            # diagonal GN step with a fixed damping (domain units)
            cur = jnp.clip(cur - 0.1 * g / (scale[None, :] ** 2 + 1.0),
                           0.0, 1.0)
        return cur

    uv = uv0
    ctrl = solve(uv)
    for _ in range(iterations - 1):
        uv = reparam(ctrl, uv)
        ctrl = solve(uv)
    return BSplineSurface(control=ctrl.reshape(gu, gv),
                          origin=lo, scale=scale, frame=frame, centroid=mu)


class TrimmedBSplineSurface(NamedTuple):
    """Surface + closed trim curve in the (u,v) parameter domain
    (reference: on_nurbs trimmed-surface workflow —
    fitting_curve_2d_pdm.h boundary curve fitted in the parameter plane,
    stored as the surface's outer trim)."""
    surface: BSplineSurface
    trim: "BSplineCurve2D"       # closed curve in normalized (u,v)


def _polygon_contains(poly: jax.Array, pts: jax.Array) -> jax.Array:
    """Even-odd ray cast: poly [P,2] closed polygon, pts [M,2] -> bool."""
    x, y = pts[:, 0:1], pts[:, 1:2]
    x0, y0 = poly[None, :, 0], poly[None, :, 1]
    x1 = jnp.roll(poly[:, 0], -1)[None, :]
    y1 = jnp.roll(poly[:, 1], -1)[None, :]
    cond = (y0 <= y) != (y1 <= y)
    t = (y - y0) / jnp.where(jnp.abs(y1 - y0) > 1e-12, y1 - y0, 1e-12)
    xi = x0 + t * (x1 - x0)
    crossings = jnp.sum(cond & (xi > x), axis=1)
    return (crossings % 2) == 1


@partial(jax.jit, static_argnames=("grid_u", "grid_v", "n_trim_control",
                                   "iterations"))
def fit_trimmed_bspline_surface(
    cloud: Cloud,
    grid_u: int = 10,
    grid_v: int = 10,
    n_trim_control: int = 16,
    iterations: int = 3,
    interior_smoothness: float = 1e-3,
    boundary_smoothness: float = 1e-1,
) -> TrimmedBSplineSurface:
    """Fit an iterated PDM surface AND its outer trim: the data's (u,v)
    footprint boundary is fitted with a closed B-spline curve in the
    parameter plane — the reference's trimmed-NURBS workflow
    (fitting_surface_pdm + fitting_curve_2d_pdm over the projected
    boundary, examples/surface/example_nurbs_fitting_surface.cpp)."""
    surf = fit_bspline_surface_iterated(
        cloud, grid_u, grid_v, interior_smoothness, boundary_smoothness,
        iterations=iterations)
    # data footprint in the parameter plane; the trim follows the OUTER
    # CONTOUR (per-angular-bin maximal radius around the footprint
    # centroid — the boundary points the reference's curve fitting
    # consumes), not the interior mass
    local = (cloud.xyz - surf.centroid) @ surf.frame.T
    uv = (local[:, :2] - surf.origin) / surf.scale
    w = cloud.mask.astype(jnp.float32)
    cuv = (uv * w[:, None]).sum(0) / jnp.maximum(w.sum(), 1.0)
    rel = uv - cuv
    rad = jnp.linalg.norm(rel, axis=1)
    nbins = 64
    abin = jnp.clip(((jnp.arctan2(rel[:, 1], rel[:, 0]) / (2 * jnp.pi) + 0.5)
                     * nbins).astype(jnp.int32), 0, nbins - 1)
    rmax = jax.ops.segment_max(jnp.where(cloud.mask, rad, 0.0), abin,
                               num_segments=nbins)
    # empty bins inherit the global max (keeps the contour closed)
    rmax = jnp.where(rmax > 0, rmax, jnp.max(rmax))
    ang = (jnp.arange(nbins) + 0.5) / nbins * 2 * jnp.pi - jnp.pi
    contour = cuv[None, :] + 1.02 * rmax[:, None] * jnp.stack(
        [jnp.cos(ang), jnp.sin(ang)], axis=1)
    trim = fit_bspline_curve2d(contour, jnp.ones((nbins,), bool),
                               n_control=n_trim_control, smoothness=1e-3)
    return TrimmedBSplineSurface(surface=surf, trim=trim)


@partial(jax.jit, static_argnames=("n_poly",))
def trimmed_surface_contains(ts: TrimmedBSplineSurface, uv: jax.Array,
                             n_poly: int = 128) -> jax.Array:
    """Inside-trim test for [M,2] normalized (u,v)."""
    t = jnp.linspace(0.0, 1.0, n_poly, endpoint=False)
    poly = eval_bspline_curve2d(ts.trim, t)
    return _polygon_contains(poly, uv)


@partial(jax.jit, static_argnames=("nu", "nv", "n_poly"))
def eval_trimmed_bspline_surface(
    ts: TrimmedBSplineSurface,
    nu: int = 32,
    nv: int = 32,
    n_poly: int = 128,
):
    """Sample the trimmed surface on an [nu x nv] parameter grid.
    Returns (points [nu*nv,3], inside [nu*nv] bool) — points outside the
    trim are still evaluated but masked, the static-shape analog of the
    reference's trimmed triangulation."""
    u = jnp.linspace(0.0, 1.0, nu)
    v = jnp.linspace(0.0, 1.0, nv)
    uu, vv = jnp.meshgrid(u, v, indexing="ij")
    uv = jnp.stack([uu.reshape(-1), vv.reshape(-1)], axis=1)
    pts = eval_bspline_surface(ts.surface, uv)
    inside = trimmed_surface_contains(ts, uv, n_poly=n_poly)
    return pts, inside


class BSplineCurve2D(NamedTuple):
    control: jax.Array   # [G, 2] control points (closed: wraps mod G)


def create_mesh_indices(seg_x: int, seg_y: int, vidx: int = 0):
    """Grid triangulation in the reference's exact order
    (on_nurbs/triangulation.cpp Triangulation::createIndices): per quad
    (j, i) two triangles (i0, i1, i2) and (i0, i2, i3) over a
    (seg_x + 1)-wide vertex grid, quads row-major. Returns
    [2 * seg_x * seg_y, 3] int32."""
    import numpy as np
    j, i = np.meshgrid(np.arange(seg_y), np.arange(seg_x), indexing="ij")
    j = j.reshape(-1)
    i = i.reshape(-1)
    i0 = vidx + (seg_x + 1) * j + i
    i1 = i0 + 1
    i2 = vidx + (seg_x + 1) * (j + 1) + i + 1
    i3 = i2 - 1
    t1 = np.stack([i0, i1, i2], 1)
    t2 = np.stack([i0, i2, i3], 1)
    return np.stack([t1, t2], 1).reshape(-1, 3).astype(np.int32)


def convert_surface_to_mesh(surf: BSplineSurface, resolution: int):
    """(vertices [(r+1)^2, 3], triangles [2 r^2, 3]): the fitted surface
    evaluated on its full parameter domain at the given resolution, with
    the reference's vertex order (row j outer, column i inner —
    Triangulation::convertSurface2PolygonMesh / createVertices) and
    triangle index order (createIndices)."""
    import numpy as np
    r = resolution
    u = np.linspace(0.0, 1.0, r + 1, dtype=np.float32)
    uu, vv = np.meshgrid(u, u, indexing="ij")   # j over rows = v? see below
    # createVertices: outer loop j over y (v), inner i over x (u)
    uv = np.stack([np.tile(u, r + 1),                    # i / x fast
                   np.repeat(u, r + 1)], 1)              # j / y slow
    verts = eval_bspline_surface(surf, jnp.asarray(uv))
    return verts, create_mesh_indices(r, r)


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


class BSplineCurve3D(NamedTuple):
    control: jax.Array   # [G, 3] control points (closed: wraps mod G)
    centroid: jax.Array  # [3]
    frame: jax.Array     # [3, 3] PCA rows (parameterization plane)


@partial(jax.jit, static_argnames=("n_control",))
def fit_bspline_curve3d(
    points: jax.Array,
    mask: jax.Array,
    n_control: int = 12,
    smoothness: float = 1e-2,
) -> BSplineCurve3D:
    """Closed cubic B-spline SPACE curve fit (the reference's
    on_nurbs::FittingCurve / example_nurbs_fitting_closed_curve3d):
    points are parameterized by angle in their PCA-dominant plane, the
    [G, 3] control polygon solved in closed form with a periodic
    second-difference prior — the 3-D generalization of
    fit_bspline_curve2d (same normal equations, one extra column)."""
    w = mask.astype(jnp.float32)
    n = jnp.maximum(w.sum(), 1.0)
    mu = (points * w[:, None]).sum(0) / n
    d = (points - mu) * w[:, None]
    cov = d.T @ d / n
    _, V = jnp.linalg.eigh(cov)                # ascending
    frame = V[:, ::-1].T                       # rows: major, mid, normal
    local = (points - mu) @ frame.T
    theta = jnp.arctan2(local[:, 1], local[:, 0])
    t = (theta / (2 * jnp.pi) + 0.5) * n_control
    i0 = jnp.floor(t).astype(jnp.int32)
    B = _cubic_basis(t - i0)
    G = n_control
    A = jnp.zeros((points.shape[0], G), jnp.float32)
    for a in range(4):
        A = A.at[jnp.arange(points.shape[0]),
                 jnp.mod(i0 + a - 1, G)].add(B[:, a] * w)
    ii = jnp.arange(G)
    D = (jnp.eye(G) * 2.0
         - jnp.eye(G)[jnp.mod(ii + 1, G)]
         - jnp.eye(G)[jnp.mod(ii - 1, G)])
    reg = smoothness * jnp.maximum(n / G, 1.0)
    M = A.T @ A + reg * (D.T @ D) + 1e-6 * jnp.eye(G)
    ctrl = jnp.linalg.solve(M, A.T @ (points * w[:, None]))
    return BSplineCurve3D(control=ctrl, centroid=mu, frame=frame)


@jax.jit
def eval_bspline_curve3d(curve: BSplineCurve3D, t: jax.Array) -> jax.Array:
    """Evaluate the closed space curve at parameters t in [0,1) -> [M,3]."""
    G = curve.control.shape[0]
    s = t * G
    i0 = jnp.floor(s).astype(jnp.int32)
    B = _cubic_basis(s - i0)
    out = jnp.zeros((t.shape[0], 3), jnp.float32)
    for a in range(4):
        out = out + B[:, a:a + 1] * curve.control[jnp.mod(i0 + a - 1, G)]
    return out


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
