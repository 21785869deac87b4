"""Convex / concave hulls.

Equivalents of pcl::ConvexHull / pcl::ConcaveHull (reference: surface/
include/pcl/surface/convex_hull.h:72, concave_hull.h:55 — both wrap Qhull).
scipy.spatial wraps the same Qhull library, so the numerical behavior
matches the reference's backend; the concave hull is the alpha-shape
construction over the Delaunay triangulation (the reference's
qhull-alpha-shapes path). Host-side.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from pcl_tpu.core.cloud import Cloud, to_numpy


def convex_hull(cloud: Cloud, dim: int = 3) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (hull vertices [V,3], simplices [F,dim] int32 indices into
    the returned vertices)."""
    from scipy.spatial import ConvexHull as _CH
    xyz, _ = to_numpy(cloud, compact=True)
    pts = xyz[:, :dim]
    hull = _CH(pts)
    used = np.unique(hull.simplices)
    remap = -np.ones(len(xyz), np.int64)
    remap[used] = np.arange(len(used))
    return xyz[used], remap[hull.simplices].astype(np.int32)


def concave_hull(cloud: Cloud, alpha: float, dim: int = 2
                 ) -> Tuple[np.ndarray, np.ndarray]:
    """Alpha-shape boundary (2D: boundary edges of kept triangles;
    3D: boundary faces of kept tetrahedra). ``alpha`` is the
    circumradius bound, like setAlpha in the reference."""
    from scipy.spatial import Delaunay
    xyz, _ = to_numpy(cloud, compact=True)
    pts = xyz[:, :dim]
    tri = Delaunay(pts)
    simp = tri.simplices
    # circumradius filter
    keep = np.zeros(len(simp), bool)
    for i, s in enumerate(simp):
        p = pts[s]
        if dim == 2:
            a, b, c = p
            ab, bc, ca = np.linalg.norm(b - a), np.linalg.norm(c - b), np.linalg.norm(a - c)
            # 2-D cross product scalar (np.cross on 2-D inputs is
            # deprecated in numpy 2.x)
            e1, e2 = b - a, c - a
            area2 = abs(e1[0] * e2[1] - e1[1] * e2[0])
            r = ab * bc * ca / max(2 * area2, 1e-300)
        else:
            # 3D circumradius via the determinant formula
            A = np.vstack([p[1] - p[0], p[2] - p[0], p[3] - p[0]])
            try:
                center = np.linalg.solve(
                    2 * A, np.sum(A * A, axis=1)
                )
                r = np.linalg.norm(center)
            except np.linalg.LinAlgError:
                r = np.inf
        keep[i] = r <= alpha
    kept = simp[keep]
    # boundary facets: those appearing exactly once among kept simplices
    from collections import Counter
    facets = Counter()
    for s in kept:
        for drop in range(dim + 1):
            f = tuple(sorted(np.delete(s, drop)))
            facets[f] += 1
    boundary = np.array([f for f, c in facets.items() if c == 1], np.int64)
    if len(boundary) == 0:
        return np.zeros((0, 3), np.float32), np.zeros((0, dim), np.int32)
    used = np.unique(boundary)
    remap = -np.ones(len(xyz), np.int64)
    remap[used] = np.arange(len(used))
    return xyz[used], remap[boundary].astype(np.int32)
