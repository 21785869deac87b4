"""Higher-level segmentation — LCCP/CPC object partitioning, seeded-hue
flood fill, random-walker labeling, unary classifier.

- ``lccp_segmentation``: pcl::LCCPSegmentation (reference: segmentation/
  include/pcl/segmentation/lccp_segmentation.h) — merges supervoxels across
  *convex* adjacency edges (extended convexity criterion CC + sanity
  criterion SC of Stein et al.), leaving concave boundaries as object cuts.
  Edge classification is one batched op over the supervoxel adjacency; the
  merge is min-label propagation over the convex edges.
- ``cpc_segmentation``: pcl::CPCSegmentation (cpc_segmentation.h) — LCCP +
  constrained plane cuts: each LCCP segment's concave boundary points vote
  for a cutting plane (weighted SAC), splitting segments the convexity
  merge left joined.
- ``seeded_hue_segmentation``: pcl::SeededHueSegmentation (seeded_hue_
  segmentation.h) — euclidean flood fill from seeds, gated by hue distance.
- ``random_walker``: pcl::segmentation::RandomWalker (segmentation/include/
  pcl/segmentation/impl/random_walker.hpp) — solves the combinatorial
  Dirichlet problem on the kNN graph Laplacian; the reference uses Eigen
  sparse LU, here jax.scipy.sparse.linalg.cg with a matvec of segment-sum
  gathers (each unseeded point gets the label with the largest arrival
  probability).
- ``unary_classifier``: pcl::UnaryClassifier (unary_classifier.h) — FPFH
  cloud -> k-means codebook at train time; at query, nearest-centroid
  distance labels each point.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pcl_tpu.core.cloud import Cloud, ATTR_NORMAL, ATTR_RGB
from pcl_tpu.search import bruteforce
from pcl_tpu.segmentation.supervoxel import SupervoxelResult


def _merge_labels_np(n: int, eu: np.ndarray, ev: np.ndarray) -> np.ndarray:
    """Union-find merge of n nodes over edges (host; S is tiny)."""
    parent = np.arange(n)

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    for a, b in zip(eu, ev):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    roots = np.array([find(i) for i in range(n)])
    _, compact = np.unique(roots, return_inverse=True)
    return compact


@jax.jit
def _convexity_edges(centers, normals, valid, adj_idx, adj_ok,
                     concavity_tolerance, smoothness_check):
    """Classify supervoxel adjacency edges as convex (CC criterion):
    edge i->j convex iff (n_i - n_j) . (c_i - c_j)/|..| >= -tan(tol)
    plus the sanity check that normals do not flip across the edge."""
    ci = centers[:, None, :]
    cj = centers[adj_idx]
    ni = normals[:, None, :]
    nj = normals[adj_idx]
    d = cj - ci
    dn = d / (jnp.linalg.norm(d, axis=-1, keepdims=True) + 1e-12)
    # CC: angle(n_i, d) - angle(n_j, d) ; convex if n_i sees j "below" plane
    a1 = jnp.sum(ni * dn, axis=-1)
    a2 = jnp.sum(nj * dn, axis=-1)
    convex = (a1 - a2) < concavity_tolerance
    # sanity criterion: direction of the intersection seam vs edge
    cosn = jnp.sum(ni * nj, axis=-1)
    convex &= cosn > smoothness_check
    return convex & adj_ok


def lccp_segmentation(
    sv: SupervoxelResult,
    concavity_tolerance: float = 0.17,   # ~10 deg (reference default 10)
    smoothness_threshold: float = 0.0,
    k_adjacency: int = 6,
    min_segment_size: int = 0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Merge convexly-connected supervoxels. Returns (point_labels [N] i32,
    supervoxel_segment [S] i32)."""
    centers, valid, normals = sv.centers, sv.center_valid, sv.normals
    S = centers.shape[0]
    idx, d2, ok = bruteforce.knn(centers, valid, centers, k_adjacency + 1)
    idx, ok = idx[:, 1:], ok[:, 1:] & valid[:, None]
    convex = _convexity_edges(
        centers,
        normals,
        valid,
        jnp.clip(idx, 0, S - 1),
        ok,
        jnp.float32(np.tan(concavity_tolerance)),
        jnp.float32(np.cos(np.pi / 2) if smoothness_threshold == 0 else smoothness_threshold),
    )
    convex_np = np.asarray(convex)
    idx_np = np.asarray(idx)
    eu = np.repeat(np.arange(S), idx_np.shape[1])[convex_np.reshape(-1)]
    ev = idx_np.reshape(-1)[convex_np.reshape(-1)]
    seg_of_sv = _merge_labels_np(S, eu, ev)

    pl = np.asarray(sv.labels)
    point_labels = np.where(pl >= 0, seg_of_sv[np.clip(pl, 0, S - 1)], -1)
    if min_segment_size > 0:
        ids, cnt = np.unique(point_labels[point_labels >= 0], return_counts=True)
        small = set(ids[cnt < min_segment_size].tolist())
        point_labels = np.where(
            np.isin(point_labels, list(small)), -1, point_labels
        )
    return point_labels.astype(np.int32), seg_of_sv.astype(np.int32)


def cpc_segmentation(
    cloud: Cloud,
    sv: SupervoxelResult,
    concavity_tolerance: float = 0.17,
    min_cut_score: float = 0.2,
    k_adjacency: int = 6,
) -> np.ndarray:
    """LCCP then constrained plane cuts: within each merged segment, the
    concave adjacency edges' midpoints + directions vote for a cut plane
    (weighted least squares); segments whose concave support exceeds
    ``min_cut_score`` x segment size are split by that plane
    (reference cpc_segmentation.hpp applyCuttingPlane)."""
    point_labels, seg_of_sv = lccp_segmentation(
        sv, concavity_tolerance, k_adjacency=k_adjacency
    )
    centers = np.asarray(sv.centers)
    valid = np.asarray(sv.center_valid)
    S = len(centers)
    idx, d2, ok = (np.asarray(a) for a in bruteforce.knn(
        sv.centers, sv.center_valid, sv.centers, k_adjacency + 1))
    idx, ok = idx[:, 1:], ok[:, 1:] & valid[:, None]
    convex = np.asarray(
        _convexity_edges(
            sv.centers, sv.normals, sv.center_valid,
            jnp.clip(jnp.asarray(idx), 0, S - 1), jnp.asarray(ok),
            jnp.float32(np.tan(concavity_tolerance)), jnp.float32(0.0),
        )
    )
    concave = ok & ~convex

    xyz = np.asarray(cloud.xyz)
    out = point_labels.copy()
    next_label = out.max() + 1 if out.size else 0
    for seg in np.unique(seg_of_sv):
        svs = np.flatnonzero((seg_of_sv == seg) & valid)
        if len(svs) < 2:
            continue
        # concave edge midpoints inside this segment
        mids = []
        dirs = []
        for s in svs:
            for j, o in zip(idx[s], concave[s]):
                if o and seg_of_sv[j] == seg:
                    mids.append(0.5 * (centers[s] + centers[j]))
                    dirs.append(centers[j] - centers[s])
        if len(mids) < 3 or len(mids) < min_cut_score * len(svs):
            continue
        mids = np.asarray(mids)
        dirs = np.asarray(dirs)
        dirs /= np.linalg.norm(dirs, axis=1, keepdims=True) + 1e-12
        # cut plane: passes through mean midpoint, normal = principal dir
        nrm = np.linalg.svd(dirs, full_matrices=False)[2][0]
        d0 = -nrm @ mids.mean(0)
        pts_mask = out == seg
        side = (xyz @ nrm + d0) > 0
        if (pts_mask & side).sum() > 0 and (pts_mask & ~side).sum() > 0:
            out[pts_mask & side] = next_label
            next_label += 1
    return out.astype(np.int32)


@partial(jax.jit, static_argnames=("max_sweeps",))
def seeded_hue_segmentation(
    cloud: Cloud,
    seed_mask: jax.Array,
    cluster_tolerance: float,
    delta_hue: float = 0.1,
    k: int = 12,
    max_sweeps: int = 64,
) -> jax.Array:
    """Flood fill from seeds over the kNN graph, connecting points within
    cluster_tolerance AND |hue_i - hue_j| < delta_hue (hue in [0,1), circular).
    Returns [N] bool membership."""
    if ATTR_RGB not in cloud.attrs:
        raise ValueError("seeded_hue_segmentation requires rgb")
    rgb = cloud.attrs[ATTR_RGB]
    mx = rgb.max(-1)
    mn = rgb.min(-1)
    c = mx - mn
    r, g, b = rgb[:, 0], rgb[:, 1], rgb[:, 2]
    h = jnp.where(
        c < 1e-9,
        0.0,
        jnp.where(
            mx == r,
            ((g - b) / (c + 1e-12)) % 6.0,
            jnp.where(mx == g, (b - r) / (c + 1e-12) + 2.0, (r - g) / (c + 1e-12) + 4.0),
        ),
    ) / 6.0

    n = cloud.capacity
    idx, d2, ok = bruteforce.knn(cloud.xyz, cloud.mask, cloud.xyz, k + 1)
    idx, d2, ok = idx[:, 1:], d2[:, 1:], ok[:, 1:] & cloud.mask[:, None]
    idxc = jnp.clip(idx, 0, n - 1)
    hd = jnp.abs(h[:, None] - h[idxc])
    hd = jnp.minimum(hd, 1.0 - hd)
    edge = ok & (d2 <= cluster_tolerance**2) & (hd < delta_hue)

    def body(state):
        member, _ = state
        nb = member[idxc] & edge
        new = member | nb.any(axis=1)
        new &= cloud.mask
        return new, jnp.any(new != member)

    member, _ = jax.lax.while_loop(
        lambda s: s[1], body, (seed_mask & cloud.mask, jnp.asarray(True))
    )
    return member


@partial(jax.jit, static_argnames=("k", "n_labels", "cg_iters"))
def random_walker(
    cloud: Cloud,
    seed_labels: jax.Array,
    k: int = 10,
    sigma: float = 0.1,
    n_labels: int = 4,
    cg_iters: int = 200,
) -> jax.Array:
    """Label unseeded points by random-walker arrival probabilities.
    seed_labels [N] int32: -1 unseeded, else label id in [0,n_labels).
    Solves (L_u) x = -B^T m per label with CG on the full masked system
    (seeds pinned by a large diagonal)."""
    n = cloud.capacity
    idx, d2, ok = bruteforce.knn(cloud.xyz, cloud.mask, cloud.xyz, k + 1)
    idx, d2, ok = idx[:, 1:], d2[:, 1:], ok[:, 1:] & cloud.mask[:, None]
    idxc = jnp.clip(idx, 0, n - 1)
    w = jnp.where(ok, jnp.exp(-d2 / (sigma * sigma)), 0.0)
    deg = w.sum(axis=1)

    seeded = seed_labels >= 0
    unseeded = ~seeded & cloud.mask

    def matvec(x):
        # L_uu x over the unseeded block (x forced to 0 at seeds)
        xu = jnp.where(unseeded, x, 0.0)
        gathered = (w * xu[idxc]).sum(axis=1)
        y = (deg + 1e-6) * xu - gathered
        return jnp.where(unseeded, y, x)  # identity on the seeded block

    probs = []
    for lab in range(n_labels):
        m_s = jnp.where(seeded & (seed_labels == lab), 1.0, 0.0)
        # rhs = -L_us x_s = W_us m_s on the unseeded block
        rhs = jnp.where(unseeded, (w * m_s[idxc]).sum(axis=1), 0.0)
        x, _ = jax.scipy.sparse.linalg.cg(matvec, rhs, maxiter=cg_iters)
        probs.append(jnp.where(seeded, m_s, x))
    P = jnp.stack(probs, axis=1)
    out = jnp.argmax(P, axis=1).astype(jnp.int32)
    out = jnp.where(seeded, seed_labels, out)
    return jnp.where(cloud.mask, out, -1)


class UnaryClassifier:
    """Nearest-centroid point classifier over per-point feature vectors
    (reference unary_classifier.h trains k-means clusters per object class;
    query = 1-NN over concatenated codebooks)."""

    def __init__(self):
        self.centroids: Optional[np.ndarray] = None
        self.class_of: Optional[np.ndarray] = None

    def train(self, features_per_class: list, clusters_per_class: int = 8):
        from pcl_tpu.ml.kmeans import kmeans

        cents, cls = [], []
        for ci, feats in enumerate(features_per_class):
            f = jnp.asarray(np.asarray(feats, np.float32))
            kk = min(clusters_per_class, len(feats))
            c, _, _ = kmeans(f, jnp.ones((f.shape[0],), bool), kk, max_iterations=20)
            cents.append(np.asarray(c))
            cls.append(np.full(kk, ci))
        self.centroids = np.concatenate(cents, 0)
        self.class_of = np.concatenate(cls, 0)
        return self

    def segment(self, features: np.ndarray) -> np.ndarray:
        f = np.asarray(features, np.float32)
        d = ((f[:, None, :] - self.centroids[None]) ** 2).sum(-1)
        return self.class_of[d.argmin(1)].astype(np.int32)
