"""Organized (image-grid) segmentation — multi-plane extraction, connected
components by comparator, polygonal prism.

- ``organized_multi_plane_segmentation``: pcl::OrganizedMultiPlaneSegmentation
  (reference: segmentation/include/pcl/segmentation/
  organized_multi_plane_segmentation.h) — per-pixel plane hypotheses
  (normal + d) grouped into connected components when adjacent pixels agree
  within angular/distance thresholds (the PlaneCoefficientComparator),
  then per-component plane refit. The reference scans pixels sequentially
  with OrganizedConnectedComponentSegmentation; the TPU re-design runs
  4-neighbor comparator tests as shifted-image ops and labels components by
  iterated min-label propagation (lax.while_loop) — the same connected-
  component semantics, fully on device.
- ``organized_connected_components``: generic comparator-driven labeling
  (euclidean / rgb / edge-aware comparators as shifted-image predicates),
  equivalent of OrganizedConnectedComponentSegmentation with
  EuclideanComparator/RGBComparator.
- ``extract_polygonal_prism``: pcl::ExtractPolygonalPrismData
  (segmentation/include/pcl/segmentation/extract_polygonal_prism_data.h) —
  points whose plane-distance lies in [min,max] height AND whose in-plane
  projection falls inside the hull polygon (ray-crossing parity test,
  batched over points x hull edges).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pcl_tpu.core.cloud import Cloud, ATTR_NORMAL, ATTR_RGB


def _propagate_min_labels(adj_ok: jax.Array, valid: jax.Array, max_sweeps: int):
    """adj_ok: [H,W,4] connectivity to (up,down,left,right). Min-label flood
    on the image grid."""
    H, W = valid.shape
    init = jnp.where(valid, jnp.arange(H * W).reshape(H, W), H * W)

    def shift(a, dy, dx, fill):
        a = jnp.roll(a, (dy, dx), (0, 1))
        if dy == 1:
            a = a.at[0, :].set(fill)
        if dy == -1:
            a = a.at[-1, :].set(fill)
        if dx == 1:
            a = a.at[:, 0].set(fill)
        if dx == -1:
            a = a.at[:, -1].set(fill)
        return a

    big = H * W

    def body(state):
        lab, _ = state
        cand = lab
        for i, (dy, dx) in enumerate(((1, 0), (-1, 0), (0, 1), (0, -1))):
            nb = shift(lab, dy, dx, big)
            cand = jnp.minimum(cand, jnp.where(adj_ok[..., i], nb, big))
        cand = jnp.where(valid, cand, big)
        return cand, jnp.any(cand != lab)

    def cond(state):
        return state[1]

    lab, _ = jax.lax.while_loop(
        cond, body, (init, jnp.asarray(True))
    )
    return jnp.where(valid, lab, -1)


@partial(jax.jit, static_argnames=("max_sweeps",))
def organized_connected_components(
    xyz_img: jax.Array,
    valid: jax.Array,
    distance_threshold: float = 0.02,
    max_sweeps: int = 256,
) -> jax.Array:
    """[H,W] int32 labels (-1 invalid): adjacent pixels connect when their
    euclidean distance < threshold (EuclideanComparator)."""
    d_thr2 = distance_threshold * distance_threshold

    def nb_ok(dy, dx):
        nb = jnp.roll(xyz_img, (dy, dx), (0, 1))
        nbv = jnp.roll(valid, (dy, dx), (0, 1))
        ok = (jnp.sum((xyz_img - nb) ** 2, -1) < d_thr2) & nbv & valid
        H, W = valid.shape
        if dy == 1:
            ok = ok.at[0, :].set(False)
        if dy == -1:
            ok = ok.at[-1, :].set(False)
        if dx == 1:
            ok = ok.at[:, 0].set(False)
        if dx == -1:
            ok = ok.at[:, -1].set(False)
        return ok

    adj = jnp.stack([nb_ok(1, 0), nb_ok(-1, 0), nb_ok(0, 1), nb_ok(0, -1)], -1)
    return _propagate_min_labels(adj, valid, max_sweeps)


class PlanarRegion(NamedTuple):
    coefficients: np.ndarray  # [4] (nx,ny,nz,d)
    centroid: np.ndarray      # [3]
    indices: np.ndarray       # flat pixel indices
    count: int


@partial(jax.jit, static_argnames=())
def _plane_adjacency(
    xyz_img, normals_img, valid, angular_threshold, distance_threshold
):
    d_plane = -jnp.sum(xyz_img * normals_img, -1)  # per-pixel plane offset
    cos_thr = jnp.cos(angular_threshold)

    def nb_ok(dy, dx):
        nbn = jnp.roll(normals_img, (dy, dx), (0, 1))
        nbd = jnp.roll(d_plane, (dy, dx), (0, 1))
        nbv = jnp.roll(valid, (dy, dx), (0, 1))
        ok = (
            (jnp.sum(normals_img * nbn, -1) > cos_thr)
            & (jnp.abs(d_plane - nbd) < distance_threshold)
            & nbv
            & valid
        )
        if dy == 1:
            ok = ok.at[0, :].set(False)
        if dy == -1:
            ok = ok.at[-1, :].set(False)
        if dx == 1:
            ok = ok.at[:, 0].set(False)
        if dx == -1:
            ok = ok.at[:, -1].set(False)
        return ok

    return jnp.stack([nb_ok(1, 0), nb_ok(-1, 0), nb_ok(0, 1), nb_ok(0, -1)], -1)


def organized_multi_plane_segmentation(
    xyz_img: np.ndarray,
    normals_img: np.ndarray,
    valid: np.ndarray,
    min_inliers: int = 100,
    angular_threshold: float = 0.052,   # ~3 deg, reference default
    distance_threshold: float = 0.02,
) -> Tuple[np.ndarray, list]:
    """Segment an organized frame into planar regions. Returns
    ([H,W] int32 labels, list[PlanarRegion] of regions >= min_inliers)."""
    xyz_j = jnp.asarray(xyz_img, jnp.float32)
    n_j = jnp.asarray(normals_img, jnp.float32)
    v_j = jnp.asarray(valid)
    adj = _plane_adjacency(
        xyz_j, n_j, v_j, jnp.float32(angular_threshold), jnp.float32(distance_threshold)
    )
    labels = np.asarray(_propagate_min_labels(adj, v_j, 256))

    flat = labels.reshape(-1)
    xyz_f = np.asarray(xyz_img).reshape(-1, 3)
    regions = []
    out_labels = np.full_like(labels, -1)
    next_id = 0
    for lab in np.unique(flat):
        if lab < 0:
            continue
        ii = np.flatnonzero(flat == lab)
        if len(ii) < min_inliers:
            continue
        pts = xyz_f[ii]
        c = pts.mean(0)
        # least-squares plane refit (reference refine() via covariance EVD)
        cov = np.cov((pts - c).T)
        w, v = np.linalg.eigh(cov)
        nrm = v[:, 0]
        if nrm[2] > 0:  # orient toward viewpoint at origin
            nrm = -nrm
        coeff = np.concatenate([nrm, [-float(nrm @ c)]]).astype(np.float32)
        out_labels.reshape(-1)[ii] = next_id
        regions.append(PlanarRegion(coeff, c.astype(np.float32), ii, len(ii)))
        next_id += 1
    return out_labels, regions


@partial(jax.jit, static_argnames=())
def _prism_mask(xyz, mask, coeff, hull_pts2, hull_valid, u, v, origin,
                height_min, height_max):
    n = coeff[:3]
    dist = xyz @ n + coeff[3]
    in_band = (dist >= height_min) & (dist <= height_max) & mask
    rel = xyz - origin[None, :]
    px = rel @ u
    py = rel @ v
    # ray-crossing parity against hull edges
    a = hull_pts2
    b = jnp.roll(hull_pts2, -1, axis=0)
    ev = hull_valid & jnp.roll(hull_valid, -1, axis=0)
    x1, y1 = a[:, 0][None], a[:, 1][None]
    x2, y2 = b[:, 0][None], b[:, 1][None]
    pxx, pyy = px[:, None], py[:, None]
    crosses = ((y1 > pyy) != (y2 > pyy)) & (
        pxx < (x2 - x1) * (pyy - y1) / (y2 - y1 + 1e-30) + x1
    )
    inside = (jnp.sum(jnp.where(crosses & ev[None], 1, 0), axis=1) % 2) == 1
    return in_band & inside


def extract_polygonal_prism(
    cloud: Cloud,
    hull_points: np.ndarray,
    plane_coefficients: np.ndarray,
    height_min: float = 0.0,
    height_max: float = 0.5,
) -> np.ndarray:
    """[N] bool mask of points inside the prism swept from the hull polygon
    along the plane normal (setHeightLimits)."""
    coeff = np.asarray(plane_coefficients, np.float32)
    n = coeff[:3] / (np.linalg.norm(coeff[:3]) + 1e-12)
    coeff = np.concatenate([n, [coeff[3] / (np.linalg.norm(plane_coefficients[:3]) + 1e-12)]])
    a = np.array([0.0, 0.0, 1.0]) if abs(n[2]) < 0.9 else np.array([1.0, 0.0, 0.0])
    u = np.cross(a, n)
    u /= np.linalg.norm(u) + 1e-12
    v = np.cross(n, u)
    hull = np.asarray(hull_points, np.float32)
    origin = hull.mean(0)
    h2 = np.stack([(hull - origin) @ u, (hull - origin) @ v], 1).astype(np.float32)
    out = _prism_mask(
        cloud.xyz,
        cloud.mask,
        jnp.asarray(coeff, jnp.float32),
        jnp.asarray(h2),
        jnp.ones((len(h2),), bool),
        jnp.asarray(u, jnp.float32),
        jnp.asarray(v, jnp.float32),
        jnp.asarray(origin, jnp.float32),
        jnp.float32(height_min),
        jnp.float32(height_max),
    )
    return np.asarray(out)
