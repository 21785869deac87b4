"""Graph-cut segmentation — MinCut and GrabCut.

- ``min_cut_segmentation``: pcl::MinCutSegmentation (reference:
  segmentation/include/pcl/segmentation/min_cut_segmentation.h). Builds a
  kNN graph whose smoothness capacities are exp(-(d/sigma)^2), unary
  capacities from the distance to the foreground seed vs ``radius``
  (reference calculateBinaryPotential / calculateUnaryPotential), and takes
  the s-t min cut. Graph assembly (kNN + weights) is batched JAX; the cut
  itself is irregular pointer work and runs on host via
  scipy.sparse.csgraph.maximum_flow (the reference likewise hands off to
  Boost's max-flow on host).
- ``grab_cut``: pcl::GrabCut (segmentation/include/pcl/segmentation/
  grabcut_segmentation.h) — iterated graph cuts with per-side k-means color
  models over RGB points (the reference's GMM is seeded by k-means; the
  k-means stage IS our GMM-lite, each cluster a spherical Gaussian).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from scipy.sparse import csr_matrix
from scipy.sparse.csgraph import maximum_flow

from pcl_tpu.core.cloud import Cloud, ATTR_RGB
from pcl_tpu.search import bruteforce

_CAP_SCALE = 10_000.0  # scipy max-flow wants integer capacities


@partial(jax.jit, static_argnames=("k",))
def _mincut_weights(xyz, mask, center, sigma, radius, source_weight, k):
    idx, d2, valid = bruteforce.knn(xyz, mask, xyz, k + 1)
    idx, d2, valid = idx[:, 1:], d2[:, 1:], valid[:, 1:]
    valid &= mask[:, None]
    smooth = jnp.where(valid, jnp.exp(-d2 / (sigma * sigma)), 0.0)
    dc = jnp.linalg.norm(xyz - center[None, :], axis=-1)
    # reference unary: source link = source_weight for points near the seed,
    # sink link grows with distance beyond `radius`
    src_cap = jnp.where(mask, source_weight * jnp.exp(-(dc / radius) ** 2), 0.0)
    sink_cap = jnp.where(mask, source_weight * (dc / radius) ** 2, 0.0)
    return idx, smooth, src_cap, sink_cap


def max_flow_binary_labels(
    n: int,
    edges_u: np.ndarray,
    edges_v: np.ndarray,
    edge_cap: np.ndarray,
    src_cap: np.ndarray,
    sink_cap: np.ndarray,
) -> np.ndarray:
    """Generic s-t min cut over an undirected weighted graph; returns [n]
    bool (True = source/foreground side)."""
    S, T = n, n + 1
    uu = np.concatenate([edges_u, edges_v, np.full(n, S), np.arange(n)])
    vv = np.concatenate([edges_v, edges_u, np.arange(n), np.full(n, T)])
    cc = np.concatenate([edge_cap, edge_cap, src_cap, sink_cap])
    cap = np.rint(cc * _CAP_SCALE).astype(np.int64)
    keep = cap > 0
    g = csr_matrix((cap[keep], (uu[keep], vv[keep])), shape=(n + 2, n + 2))
    res = maximum_flow(g.astype(np.int32), S, T)
    # source side = reachable in the residual graph from S
    residual = g - res.flow
    residual.data = np.maximum(residual.data, 0)
    from scipy.sparse.csgraph import breadth_first_order

    order = breadth_first_order(
        (residual > 0).astype(np.int8), S, directed=True, return_predecessors=False
    )
    fg = np.zeros(n + 2, bool)
    fg[order] = True
    return fg[:n]


def min_cut_segmentation(
    cloud: Cloud,
    foreground_point: np.ndarray,
    sigma: float = 0.25,
    radius: float = 4.0,
    source_weight: float = 0.8,
    k: int = 14,
) -> np.ndarray:
    """Binary foreground mask [N] bool. Parameters mirror
    setSigma/setRadius/setSourceWeight/setNumberOfNeighbours."""
    idx, smooth, src_cap, sink_cap = _mincut_weights(
        cloud.xyz,
        cloud.mask,
        jnp.asarray(foreground_point, jnp.float32),
        jnp.float32(sigma),
        jnp.float32(radius),
        jnp.float32(source_weight),
        k,
    )
    n = cloud.capacity
    idx = np.asarray(idx)
    w = np.asarray(smooth)
    u = np.repeat(np.arange(n), idx.shape[1])
    v = idx.reshape(-1)
    c = w.reshape(-1)
    ok = c > 0
    return max_flow_binary_labels(
        n, u[ok], v[ok], c[ok], np.asarray(src_cap), np.asarray(sink_cap)
    )


def _kmeans_np(x: np.ndarray, k: int, iters: int = 10, seed: int = 0):
    rng = np.random.default_rng(seed)
    if len(x) == 0:
        return np.zeros((k, x.shape[1])), np.full(k, 1e9)
    c = x[rng.choice(len(x), size=min(k, len(x)), replace=False)]
    if len(c) < k:
        c = np.concatenate([c, np.tile(c[-1:], (k - len(c), 1))])
    for _ in range(iters):
        d = ((x[:, None, :] - c[None]) ** 2).sum(-1)
        a = d.argmin(1)
        for j in range(k):
            if (a == j).any():
                c[j] = x[a == j].mean(0)
    d = ((x[:, None, :] - c[None]) ** 2).sum(-1)
    a = d.argmin(1)
    var = np.array(
        [x[a == j].var() * 3 + 1e-4 if (a == j).any() else 1e9 for j in range(k)]
    )
    return c, var


def _nll(x: np.ndarray, centers: np.ndarray, var: np.ndarray) -> np.ndarray:
    d = ((x[:, None, :] - centers[None]) ** 2).sum(-1)
    ll = -0.5 * d / var[None] - 1.5 * np.log(var[None] + 1e-12)
    return -ll.max(1)  # best-component negative log likelihood


def grab_cut(
    cloud: Cloud,
    initial_foreground: np.ndarray,
    lam: float = 50.0,
    k_components: int = 5,
    iterations: int = 3,
    k_neighbors: int = 8,
) -> np.ndarray:
    """Iterated color-model graph cut; ``initial_foreground`` [N] bool is the
    user's rectangle/seed region (TrimapUnknown starts as its complement's
    complement). Returns refined [N] bool."""
    if ATTR_RGB not in cloud.attrs:
        raise ValueError("grab_cut requires rgb")
    xyz = np.asarray(cloud.xyz)
    mask = np.asarray(cloud.mask)
    rgb = np.asarray(cloud.attrs[ATTR_RGB])
    n = len(xyz)

    idx, d2, valid = (np.asarray(a) for a in bruteforce.knn(
        cloud.xyz, cloud.mask, cloud.xyz, k_neighbors + 1))
    idx, d2, valid = idx[:, 1:], d2[:, 1:], valid[:, 1:] & mask[:, None]
    # color-contrast pairwise term (grabcut beta)
    cdiff = ((rgb[:, None, :] - rgb[idx]) ** 2).sum(-1)
    beta = 1.0 / (2.0 * max(cdiff[valid].mean(), 1e-8))
    w = np.where(valid, lam * np.exp(-beta * cdiff), 0.0)
    u = np.repeat(np.arange(n), idx.shape[1])
    v = idx.reshape(-1)
    c = w.reshape(-1)
    ok = c > 0

    # GrabCut trimap: outside the user region = hard background; inside =
    # unknown, refined by iterated cuts (reference TrimapBackground/Unknown)
    hard_bg = mask & ~initial_foreground
    BIG = 1e5
    fg = initial_foreground.copy() & mask
    for _ in range(iterations):
        fc, fv = _kmeans_np(rgb[fg], k_components, seed=1)
        bc, bv = _kmeans_np(rgb[mask & ~fg], k_components, seed=2)
        # unary: cost of assigning to fg = bg-model NLL and vice versa
        src = np.where(mask, _nll(rgb, bc, bv), 0.0)   # cut from sink=keep fg
        snk = np.where(mask, _nll(rgb, fc, fv), 0.0)
        src = np.where(hard_bg, 0.0, np.minimum(src, BIG))
        snk = np.where(hard_bg, BIG, np.minimum(snk, BIG))
        new_fg = max_flow_binary_labels(n, u[ok], v[ok], c[ok], src, snk) & mask
        if (new_fg == fg).all():
            break
        fg = new_fg
    return fg
