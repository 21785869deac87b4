"""RoPS — rotational projection statistics descriptor.

Equivalent of pcl::ROPSEstimation (reference: features/include/pcl/features/
rops_estimation.h — Guo et al.: rotate the local surface about each LRF axis
by a set of angles, project onto the three coordinate planes, and collect
distribution-matrix statistics: central moments mu11, mu21, mu12 and Shannon
entropy). Default 3 rotations x 3 axes x 3 planes x (3 moments + entropy)
wait — the reference emits 135 = 3 axes x 3 rotations x 3 planes x 5 stats;
here stats = (mu11, mu12, mu21, mu22, entropy) to match that width.

The reference rotates a triangle MESH and weights by triangle area; this
TPU version rotates the neighborhood POINTS (documented deviation — same
statistics, point-sampled).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from pcl_tpu.core.cloud import Cloud
from pcl_tpu.features.shot import local_reference_frames
from pcl_tpu.search import bruteforce

_EPS = 1e-12


def _rot(axis_idx: int, angle: jax.Array) -> jax.Array:
    """3x3 rotation about coordinate axis ``axis_idx`` by ``angle``."""
    c, s = jnp.cos(angle), jnp.sin(angle)
    o, z = jnp.ones_like(c), jnp.zeros_like(c)
    if axis_idx == 0:
        rows = [[o, z, z], [z, c, -s], [z, s, c]]
    elif axis_idx == 1:
        rows = [[c, z, s], [z, o, z], [-s, z, c]]
    else:
        rows = [[c, -s, z], [s, c, z], [z, z, o]]
    return jnp.stack([jnp.stack(r, -1) for r in rows], -2)


def _plane_stats(u: jax.Array, v: jax.Array, w: jax.Array,
                 grid: int = 8) -> jax.Array:
    """Distribution-matrix statistics of the 2D projection (u, v) with
    point weights w: central moments mu11/mu12/mu21/mu22 + Shannon entropy
    of the grid x grid occupancy matrix. Shapes [N,k] -> [N,5]."""
    wsum = jnp.maximum(jnp.sum(w, axis=1), _EPS)
    mu_u = jnp.sum(w * u, axis=1) / wsum
    mu_v = jnp.sum(w * v, axis=1) / wsum
    du = u - mu_u[:, None]
    dv = v - mu_v[:, None]
    m11 = jnp.sum(w * du * dv, axis=1) / wsum
    m12 = jnp.sum(w * du * dv * dv, axis=1) / wsum
    m21 = jnp.sum(w * du * du * dv, axis=1) / wsum
    m22 = jnp.sum(w * du * du * dv * dv, axis=1) / wsum
    # entropy of the normalized grid occupancy
    lo_u = jnp.min(jnp.where(w > 0, u, jnp.inf), axis=1)
    hi_u = jnp.max(jnp.where(w > 0, u, -jnp.inf), axis=1)
    lo_v = jnp.min(jnp.where(w > 0, v, jnp.inf), axis=1)
    hi_v = jnp.max(jnp.where(w > 0, v, -jnp.inf), axis=1)
    su = jnp.maximum(hi_u - lo_u, _EPS)[:, None]
    sv = jnp.maximum(hi_v - lo_v, _EPS)[:, None]
    bu = jnp.clip(((u - lo_u[:, None]) / su * grid).astype(jnp.int32), 0, grid - 1)
    bv = jnp.clip(((v - lo_v[:, None]) / sv * grid).astype(jnp.int32), 0, grid - 1)
    flat = bu * grid + bv
    n = u.shape[0]
    row = jnp.broadcast_to(jnp.arange(n)[:, None], flat.shape)
    D = jnp.zeros((n, grid * grid), jnp.float32).at[
        row.reshape(-1), flat.reshape(-1)].add(w.reshape(-1))
    D = D / wsum[:, None]
    ent = -jnp.sum(jnp.where(D > 0, D * jnp.log(jnp.maximum(D, _EPS)), 0.0), axis=1)
    return jnp.stack([m11, m12, m21, m22, ent], axis=-1)


def _axis_rot(axis_idx: int, angle_deg: jax.Array) -> jax.Array:
    """Rodrigues rotation about the coordinate axis (rops_estimation.hpp:408
    specializes to the x/y/z unit axes; angle in degrees there)."""
    return _rot(axis_idx, angle_deg * (jnp.pi / 180.0))


def _central_moments(D: jax.Array) -> jax.Array:
    """computeCentralMoments (rops_estimation.hpp:492): 1-based bin-index
    central moments mu11, mu21, mu12, mu22 + Shannon entropy of the
    normalized distribution matrix. D: [..., b, b] -> [..., 5]."""
    b = D.shape[-1]
    i = jnp.arange(1, b + 1, dtype=jnp.float32)
    mean_i = jnp.einsum("...ij,i->...", D, i)
    mean_j = jnp.einsum("...ij,j->...", D, i)
    fi = i[:, None] - mean_i[..., None, None]       # [..., b, 1]
    fj = i[None, :] - mean_j[..., None, None]       # [..., 1, b]
    mu11 = jnp.sum(fi * fj * D, axis=(-2, -1))
    mu21 = jnp.sum(fi * fi * fj * D, axis=(-2, -1))
    mu12 = jnp.sum(fi * fj * fj * D, axis=(-2, -1))
    mu22 = jnp.sum(fi * fi * fj * fj * D, axis=(-2, -1))
    ent = -jnp.sum(jnp.where(D > 0, D * jnp.log(jnp.maximum(D, _EPS)), 0.0),
                   axis=(-2, -1))
    return jnp.stack([mu11, mu21, mu12, mu22, ent], axis=-1)


@partial(jax.jit,
         static_argnames=("n_rotations", "n_bins", "cap_pts", "cap_tri"))
def _rops_mesh_chunk(
    xyz: jax.Array,           # [N,3] surface points
    tri: jax.Array,           # [T,3] int32 triangle vertex indices
    kp: jax.Array,            # [Kc,3] keypoints of this chunk
    support_radius: float,
    n_rotations: int,
    n_bins: int,
    cap_pts: int,
    cap_tri: int,
):
    n = xyz.shape[0]
    r2 = jnp.float32(support_radius) ** 2
    d2 = (jnp.sum(kp * kp, 1)[:, None] - 2.0 * kp @ xyz.T
          + jnp.sum(xyz * xyz, 1)[None])                     # [Kc,N]
    member = d2 <= r2

    # packed local points: the cap_pts nearest (all inside r in the intended
    # regime; overflow_pts reports truncation)
    neg, pidx = jax.lax.top_k(-d2, cap_pts)                  # [Kc,cap]
    p_valid = (-neg) <= r2
    n_local = jnp.sum(member, axis=1)
    overflow_pts = n_local > cap_pts

    # local triangles: any vertex inside the support (getLocalSurface)
    tmask = (jnp.take_along_axis(member, tri[None, :, 0].repeat(kp.shape[0], 0), 1)
             | jnp.take_along_axis(member, tri[None, :, 1].repeat(kp.shape[0], 0), 1)
             | jnp.take_along_axis(member, tri[None, :, 2].repeat(kp.shape[0], 0), 1))
    tvals, tidx = jax.lax.top_k(tmask.astype(jnp.float32), cap_tri)
    t_valid = tvals > 0.0
    overflow_tri = jnp.sum(tmask, axis=1) > cap_tri

    # ---- LRF (computeLRF, hpp:239): area+distance weighted triangle scatter
    tv = xyz[tri]                                            # [T,3,3]
    verts = tv[tidx]                                         # [Kc,cap_tri,3,3]
    v = verts - kp[:, None, None, :]                         # vertex - feature
    e1 = verts[..., 1, :] - verts[..., 0, :]
    e2 = verts[..., 2, :] - verts[..., 0, :]
    area = jnp.linalg.norm(jnp.cross(e1, e2), axis=-1)       # [Kc,cap_tri]
    area = jnp.where(t_valid, area, 0.0)
    centroid = jnp.mean(verts, axis=-2)
    dw = (jnp.float32(support_radius)
          - jnp.linalg.norm(centroid - kp[:, None, :], axis=-1)) ** 2
    s = jnp.sum(v, axis=-2)                                  # [Kc,cap_tri,3]
    scatter = (jnp.einsum("ktvi,ktvj->ktij", v, v)
               + jnp.einsum("kti,ktj->ktij", s, s)) / 12.0
    total_area = jnp.sum(area, axis=1)
    inv_area = jnp.where(total_area < _EPS, 1.0, 1.0 / total_area)
    factor = jnp.where(t_valid, dw * area * inv_area[:, None], 0.0)
    S = jnp.einsum("kt,ktij->kij", factor, scatter)

    from pcl_tpu.core.geometry import eigh33
    _, vecs = eigh33(S)                                      # ascending
    v1 = vecs[..., :, 2]                                     # major
    v3 = vecs[..., :, 0]                                     # minor
    tw = factor / 6.0
    f1 = jnp.einsum("ktvi,ki->kt", v, v1)
    f3 = jnp.einsum("ktvi,ki->kt", v, v3)
    h1 = jnp.sum(tw * f1, axis=1)
    h3 = jnp.sum(tw * f3, axis=1)
    v1 = jnp.where((h1 < 0)[:, None], -v1, v1)
    v3 = jnp.where((h3 < 0)[:, None], -v3, v3)
    v2 = jnp.cross(v3, v1)
    lrf = jnp.stack([v1, v2, v3], axis=-2)                   # [Kc,3,3] rows

    # ---- transform the local points into the LRF
    pts = xyz[pidx] - kp[:, None, :]                         # [Kc,cap,3]
    pts = jnp.einsum("kij,kpj->kpi", lrf, pts)
    w = p_valid.astype(jnp.float32)
    count = jnp.maximum(jnp.sum(w, axis=1), 1.0)

    step = 90.0 / (n_rotations + 1)
    projections = ((0, 1), (0, 2), (1, 2))
    feats = []
    for axis in range(3):
        for i_rot in range(1, n_rotations + 1):
            R = _axis_rot(axis, jnp.float32(step * i_rot))
            p = jnp.einsum("ij,kpj->kpi", R, pts)
            big = jnp.float32(3.4e38)
            lo = jnp.min(jnp.where(p_valid[..., None], p, big), axis=1)
            hi = jnp.max(jnp.where(p_valid[..., None], p, -big), axis=1)
            for (ui, vi) in projections:
                bl_u = (hi[:, ui] - lo[:, ui]) / n_bins
                bl_v = (hi[:, vi] - lo[:, vi]) / n_bins
                bu = jnp.clip(((p[..., ui] - lo[:, None, ui])
                               / jnp.maximum(bl_u, _EPS)[:, None]
                               ).astype(jnp.int32), 0, n_bins - 1)
                bv = jnp.clip(((p[..., vi] - lo[:, None, vi])
                               / jnp.maximum(bl_v, _EPS)[:, None]
                               ).astype(jnp.int32), 0, n_bins - 1)
                ou = jax.nn.one_hot(bu, n_bins, dtype=jnp.float32) * w[..., None]
                ov = jax.nn.one_hot(bv, n_bins, dtype=jnp.float32)
                D = jnp.einsum("kpi,kpj->kij", ou, ov) / count[:, None, None]
                feats.append(_central_moments(D))
    out = jnp.concatenate(feats, axis=-1)                    # [Kc,135]
    norm = jnp.sum(jnp.abs(out), axis=-1, keepdims=True)
    out = out / jnp.where(norm < _EPS, 1.0, norm)
    return out, lrf, overflow_pts, overflow_tri


def estimate_rops_mesh(
    xyz,
    triangles,
    keypoint_indices,
    support_radius: float,
    *,
    n_rotations: int = 3,
    n_bins: int = 5,
    cap_pts: int = 512,
    cap_tri: int = 2048,
    chunk: int = 128,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Reference-faithful mesh-based RoPS (pcl::ROPSEstimation,
    features/impl/rops_estimation.hpp:133).

    Per keypoint: radius-limited local surface; local triangles = all mesh
    triangles incident to a local point (getLocalSurface:227); LRF from the
    triangle-area x squared-distance weighted vertex scatter with h1/h3
    sign disambiguation (computeLRF:239); the local POINTS transformed into
    the LRF and rotated about each axis by theta = 90/(n_rot+1) * {1..n_rot}
    degrees; per rotation, the xy/xz/yz projections are binned into an
    n_bins^2 distribution matrix over the rotated bounding box
    (getDistributionMatrix:457) whose central moments mu11, mu21, mu12,
    mu22 + Shannon entropy stack into the descriptor
    (computeCentralMoments:492), L1-normalized at the end.

    TPU re-design: keypoints run in fixed-size chunks; neighborhoods and
    incident-triangle sets are packed to static caps (``cap_pts`` /
    ``cap_tri``); the distribution matrix is a one-hot x one-hot batched
    matmul instead of a scatter. Returns (descriptors [K, 45*n_rotations],
    lrfs [K,3,3], overflow [K] — True where a cap truncated the support;
    raise the caps if any).
    """
    xyz = jnp.asarray(xyz, jnp.float32)
    tri = jnp.asarray(triangles, jnp.int32)
    kidx = jnp.asarray(keypoint_indices, jnp.int32)
    kp_all = xyz[kidx]
    k = kp_all.shape[0]
    outs, lrfs, ovs = [], [], []
    for i0 in range(0, k, chunk):
        kp = kp_all[i0:i0 + chunk]
        pad = chunk - kp.shape[0]
        if pad:
            kp = jnp.concatenate([kp, jnp.zeros((pad, 3), jnp.float32)])
        f, l, op, ot = _rops_mesh_chunk(
            xyz, tri, kp, float(support_radius), n_rotations, n_bins,
            cap_pts, cap_tri)
        take = chunk - pad
        outs.append(f[:take])
        lrfs.append(l[:take])
        ovs.append((op | ot)[:take])
    return (jnp.concatenate(outs), jnp.concatenate(lrfs),
            jnp.concatenate(ovs))


@partial(jax.jit, static_argnames=("k", "n_rotations", "grid"))
def estimate_rops(
    cloud: Cloud,
    radius: float,
    *,
    k: int = 64,
    n_rotations: int = 3,
    grid: int = 8,
) -> Tuple[jax.Array, jax.Array]:
    """RoPS descriptors [N, 3*n_rotations*3*5] (=135 by default) + LRFs.

    Per point: express neighbors in the LRF, then for each axis and each
    rotation angle, rotate and project onto the xy/xz/yz planes, collecting
    the 5 distribution statistics per projection."""
    xyz, mask = cloud.xyz, cloud.mask
    n = cloud.capacity
    idx, d2, valid, _ = bruteforce.radius(xyz, mask, xyz, radius, cap=k)
    idxc = jnp.clip(idx, 0, n - 1)
    valid = valid & mask[:, None]
    nbr = xyz[idxc]
    frames, ok = local_reference_frames(xyz, nbr, valid, radius)
    rel = jnp.einsum("nij,nkj->nki", frames, nbr - xyz[:, None, :])
    rel = rel / radius                                   # scale-normalize
    w = valid.astype(jnp.float32)

    feats = []
    angles = (jnp.arange(n_rotations, dtype=jnp.float32) + 1.0) \
        / (n_rotations + 1.0) * (0.5 * jnp.pi)
    for axis in range(3):
        for ai in range(n_rotations):
            R = _rot(axis, angles[ai])                   # [3,3]
            p = jnp.einsum("ij,nkj->nki", R, rel)
            for (u_i, v_i) in ((0, 1), (0, 2), (1, 2)):
                feats.append(_plane_stats(p[..., u_i], p[..., v_i], w, grid))
    out = jnp.concatenate(feats, axis=-1)
    return jnp.where((mask & ok)[:, None], out, 0.0), frames
