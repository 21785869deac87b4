"""Point-cloud triangulation — greedy projection + polygon ear clipping.

- ``greedy_projection_triangulation``: capability match for
  pcl::GreedyProjectionTriangulation (reference: surface/include/pcl/surface/
  gp3.h:129,377). PCL grows an advancing front sequentially, one fringe
  point at a time — inherently serial and pointer-heavy. The TPU re-design
  computes, for EVERY point in parallel, a local tangent-plane fan: project
  the k nearest neighbors onto the point's tangent plane, sort them by
  angle, and emit a triangle between each pair of angularly-consecutive
  neighbors that passes the same visibility gates gp3 uses (max edge length
  via ``mu`` times the nearest-neighbor distance, min/max triangle angle,
  normal consistency). Duplicate triangles produced by up to three owning
  fans are deduplicated on host. This is one batched jit (sort + gather) —
  no front data structure.
- ``ear_clipping``: pcl::EarClipping (reference: surface/include/pcl/surface/
  ear_clipping.h) — triangulates simple polygons (mesh faces with >3
  vertices) by iteratively clipping ears. Polygons are tiny (boundary loops),
  so this runs on host numpy; the area/containment tests are vectorized
  over candidate ears.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pcl_tpu.core.cloud import Cloud, ATTR_NORMAL
from pcl_tpu.search import bruteforce


@partial(
    jax.jit,
    static_argnames=("k",),
)
def _fan_candidates(
    xyz: jax.Array,
    mask: jax.Array,
    normals: jax.Array,
    k: int,
    mu: float,
    search_radius: float,
    min_angle: float,
    max_angle: float,
    eps_angle: float,
):
    """Per-point tangent fans. Returns ([N,k,3] i32 triangles, [N,k] bool)."""
    n_pts = xyz.shape[0]
    idx, d2, _ = bruteforce.knn(xyz, mask, xyz, k + 1)  # self included
    # drop self column (nearest neighbor of a point is itself)
    idx = idx[:, 1:]
    d2 = d2[:, 1:]
    d = jnp.sqrt(jnp.maximum(d2, 0.0))
    nn_valid = mask[jnp.clip(idx, 0, n_pts - 1)] & mask[:, None] & (d2 < 1e29)

    # gp3's distance gate: edge <= min(mu * d_1nn, search_radius)
    d1 = jnp.where(nn_valid[:, 0], d[:, 0], jnp.inf)
    max_edge = jnp.minimum(mu * d1, search_radius)
    nn_valid &= d <= max_edge[:, None]

    # normal-consistency gate (gp3 eps_angle_ between point normals)
    nbr_n = normals[jnp.clip(idx, 0, n_pts - 1)]
    cos_eps = jnp.cos(eps_angle)
    nn_valid &= jnp.abs(jnp.sum(nbr_n * normals[:, None, :], axis=-1)) >= cos_eps

    # tangent-plane frame per point
    n = normals
    a = jnp.where(
        jnp.abs(n[:, 2:3]) < 0.9,
        jnp.asarray([0.0, 0.0, 1.0], n.dtype)[None, :],
        jnp.asarray([1.0, 0.0, 0.0], n.dtype)[None, :],
    )
    u = jnp.cross(a, n)
    u = u / (jnp.linalg.norm(u, axis=-1, keepdims=True) + 1e-12)
    v = jnp.cross(n, u)

    rel = xyz[jnp.clip(idx, 0, n_pts - 1)] - xyz[:, None, :]
    pu = jnp.sum(rel * u[:, None, :], axis=-1)
    pv = jnp.sum(rel * v[:, None, :], axis=-1)
    theta = jnp.arctan2(pv, pu)
    theta = jnp.where(nn_valid, theta, jnp.inf)  # invalid sort to the end

    order = jnp.argsort(theta, axis=1)
    theta_s = jnp.take_along_axis(theta, order, axis=1)
    idx_s = jnp.take_along_axis(idx, order, axis=1)
    valid_s = jnp.take_along_axis(nn_valid, order, axis=1)
    cnt = valid_s.sum(axis=1)

    # consecutive pairs around the fan (wrap via first valid)
    nxt = jnp.roll(idx_s, -1, axis=1)
    nxt_theta = jnp.roll(theta_s, -1, axis=1)
    # wrap: the pair (last_valid, first) spans 2pi - (last - first)
    gap = jnp.where(
        jnp.arange(k)[None, :] == (cnt - 1)[:, None],
        2.0 * jnp.pi - (theta_s - theta_s[:, 0:1]),
        nxt_theta - theta_s,
    )
    nxt = jnp.where(
        jnp.arange(k)[None, :] == (cnt - 1)[:, None], idx_s[:, 0:1] * jnp.ones_like(nxt), nxt
    )
    pair_valid = valid_s & (jnp.arange(k)[None, :] < cnt[:, None]) & (cnt[:, None] >= 2)
    # do not emit across large angular gaps (fringe/boundary — gp3 leaves holes)
    pair_valid &= gap <= max_angle
    pair_valid &= gap >= min_angle
    # degenerate wrap pair when cnt == 2 produces duplicate triangle; allow dedupe

    tri = jnp.stack(
        [jnp.broadcast_to(jnp.arange(n_pts)[:, None], (n_pts, k)), idx_s, nxt.astype(idx_s.dtype)],
        axis=-1,
    )
    return tri, pair_valid


def greedy_projection_triangulation(
    cloud: Cloud,
    search_radius: float,
    mu: float = 2.5,
    k: int = 16,
    min_angle: float = np.pi / 18.0,
    max_angle: float = 2.0 * np.pi / 3.0,
    eps_angle: float = np.pi / 4.0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Triangulate an oriented point cloud; returns (vertices [V,3],
    triangles [F,3] int32) with vertex indices into the compacted cloud.

    Parameters mirror gp3 setters: setSearchRadius, setMu,
    setMaximumNearestNeighbors(k), setMinimumAngle/setMaximumAngle,
    setNormalConsistency via eps_angle.
    """
    if ATTR_NORMAL not in cloud.attrs:
        raise ValueError("greedy_projection_triangulation requires normals")
    tri, ok = _fan_candidates(
        cloud.xyz,
        cloud.mask,
        cloud.attrs[ATTR_NORMAL],
        k,
        float(mu),
        float(search_radius),
        float(min_angle),
        float(max_angle),
        float(eps_angle),
    )
    tri = np.asarray(tri).reshape(-1, 3)
    ok = np.asarray(ok).reshape(-1)
    tri = tri[ok]
    # drop degenerate + dedupe by sorted vertex triple
    tri = tri[(tri[:, 0] != tri[:, 1]) & (tri[:, 1] != tri[:, 2]) & (tri[:, 0] != tri[:, 2])]
    key = np.sort(tri, axis=1)
    _, uniq = np.unique(key, axis=0, return_index=True)
    tri = tri[np.sort(uniq)]

    mask_np = np.asarray(cloud.mask)
    remap = -np.ones(mask_np.shape[0], np.int64)
    keep = np.flatnonzero(mask_np)
    remap[keep] = np.arange(keep.size)
    verts = np.asarray(cloud.xyz)[keep]
    tri = remap[tri]
    tri = tri[(tri >= 0).all(axis=1)]
    return verts.astype(np.float32), tri.astype(np.int32)


def _poly_area2(pts2: np.ndarray) -> float:
    x, y = pts2[:, 0], pts2[:, 1]
    return float(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))


def ear_clipping(
    vertices: np.ndarray, polygon: np.ndarray
) -> np.ndarray:
    """Triangulate one simple polygon (indices into ``vertices``) by ear
    clipping; returns [F,3] int32 triangles (reference ear_clipping.h
    triangulate/isEar). The polygon is projected onto its best-fit plane
    first (PCL operates on the raw 3D cross products; the projection is
    equivalent and keeps the containment test 2D)."""
    poly = np.asarray(polygon, np.int64).copy()
    pts = np.asarray(vertices, np.float64)[poly]
    # best-fit plane via PCA
    c = pts.mean(axis=0)
    _, _, vt = np.linalg.svd(pts - c, full_matrices=False)
    uv = (pts - c) @ vt[:2].T
    if _poly_area2(uv) < 0:  # enforce CCW
        poly = poly[::-1]
        uv = uv[::-1]

    tris = []
    active = list(range(len(poly)))
    guard = 0
    while len(active) > 3 and guard < 10 * len(poly):
        guard += 1
        n_a = len(active)
        clipped = False
        for j in range(n_a):
            i0, i1, i2 = active[(j - 1) % n_a], active[j], active[(j + 1) % n_a]
            a, b, c2 = uv[i0], uv[i1], uv[i2]
            cross = (b[0] - a[0]) * (c2[1] - a[1]) - (b[1] - a[1]) * (c2[0] - a[0])
            if cross <= 1e-15:
                continue  # reflex or degenerate
            # containment: no other active vertex inside triangle a,b,c2
            others = [t for t in active if t not in (i0, i1, i2)]
            if others:
                p = uv[others]
                d0 = (b[0] - a[0]) * (p[:, 1] - a[1]) - (b[1] - a[1]) * (p[:, 0] - a[0])
                d1 = (c2[0] - b[0]) * (p[:, 1] - b[1]) - (c2[1] - b[1]) * (p[:, 0] - b[0])
                d2 = (a[0] - c2[0]) * (p[:, 1] - c2[1]) - (a[1] - c2[1]) * (p[:, 0] - c2[0])
                if bool(((d0 >= 0) & (d1 >= 0) & (d2 >= 0)).any()):
                    continue
            tris.append((poly[i0], poly[i1], poly[i2]))
            active.pop(j)
            clipped = True
            break
        if not clipped:
            break  # non-simple input; emit fan for the rest
    if len(active) == 3:
        tris.append((poly[active[0]], poly[active[1]], poly[active[2]]))
    elif len(active) > 3:
        for j in range(1, len(active) - 1):
            tris.append((poly[active[0]], poly[active[j]], poly[active[j + 1]]))
    return np.asarray(tris, np.int32).reshape(-1, 3)


def triangulate_mesh_polygons(
    vertices: np.ndarray, polygons: list
) -> np.ndarray:
    """Ear-clip every polygon of a mesh into one [F,3] triangle array
    (pcl::EarClipping::performProcessing over PolygonMesh)."""
    out = [ear_clipping(vertices, p) for p in polygons if len(p) >= 3]
    if not out:
        return np.zeros((0, 3), np.int32)
    return np.concatenate(out, axis=0)
