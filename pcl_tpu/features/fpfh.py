"""PFH / FPFH descriptors — batched histogram reductions.

TPU-native re-design of pcl::FPFHEstimation / pcl::PFHEstimation (reference:
features/include/pcl/features/impl/fpfh.hpp:64-127 — computePointSPFHSignature
and weightPointSPFHSignature — and impl/pfh.hpp; pair features at
features/src/pfh.cpp computePairFeatures). PCL loops per point/per neighbor;
here every (point, neighbor) pair feature is computed in one [N, k] batch,
binned with one-hot matmuls (MXU-shaped scatter-free histogramming), and the
FPFH weighting pass is a gather + weighted sum over neighbor SPFH rows.

Descriptor layouts match the reference exactly:
- SPFH/FPFH: 33 = 11 bins each for (f1=theta in [-pi,pi], f2=alpha in [-1,1],
  f3=phi in [-1,1]); each 11-block sums to 100 (FPFHSignature33,
  common/include/pcl/impl/point_types.hpp:1995).
- PFH: 125 = joint 5x5x5 histogram over (f1,f2,f3), summing to 100
  (PFHSignature125).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from pcl_tpu.core.cloud import Cloud, ATTR_NORMAL
from pcl_tpu.search import bruteforce, hashgrid as hashgrid_mod

_EPS = 1e-12


def pair_features(
    p1: jax.Array, n1: jax.Array,
    p2: jax.Array, n2: jax.Array,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array, jax.Array]:
    """Batched Darboux-frame pair features (reference: features/src/pfh.cpp
    computePairFeatures). Inputs broadcastable [..., 3]. Returns
    (f1 theta [-pi,pi], f2 alpha [-1,1], f3 phi [-1,1], f4 distance, ok)."""
    d = p2 - p1
    f4 = jnp.sqrt(jnp.sum(d * d, axis=-1))
    ok = f4 > 0.0
    inv = 1.0 / jnp.maximum(f4, _EPS)
    angle1 = jnp.sum(n1 * d, axis=-1) * inv
    angle2 = jnp.sum(n2 * d, axis=-1) * inv
    # consistent ordering: the point whose normal is better aligned with the
    # connecting line becomes the source
    swap = jnp.abs(angle1) < jnp.abs(angle2)
    n1c = jnp.where(swap[..., None], n2, n1)
    n2c = jnp.where(swap[..., None], n1, n2)
    dc = jnp.where(swap[..., None], -d, d)
    f3 = jnp.where(swap, -angle2, angle1)
    v = jnp.cross(dc, n1c)
    v_norm = jnp.sqrt(jnp.sum(v * v, axis=-1))
    ok = ok & (v_norm > 0.0)
    v = v / jnp.maximum(v_norm, _EPS)[..., None]
    w = jnp.cross(n1c, v)
    f2 = jnp.sum(v * n2c, axis=-1)
    f1 = jnp.arctan2(jnp.sum(w * n2c, axis=-1), jnp.sum(n1c * n2c, axis=-1))
    zero = jnp.zeros_like(f4)
    return (
        jnp.where(ok, f1, zero),
        jnp.where(ok, f2, zero),
        jnp.where(ok, f3, zero),
        jnp.where(ok, f4, zero),
        ok,
    )


def _bin_index(f: jax.Array, lo: float, hi: float, nbins: int) -> jax.Array:
    idx = jnp.floor(nbins * (f - lo) / (hi - lo)).astype(jnp.int32)
    return jnp.clip(idx, 0, nbins - 1)


def _soft_hist(bin_idx: jax.Array, weights: jax.Array, nbins: int) -> jax.Array:
    """[..., k] bins + weights -> [..., nbins] histogram via one-hot matmul."""
    oh = jax.nn.one_hot(bin_idx, nbins, dtype=weights.dtype)
    return jnp.einsum("...k,...kb->...b", weights, oh)


def spfh_from_neighborhoods(
    pts: jax.Array,       # [N,3]
    nrm: jax.Array,       # [N,3]
    nbr_idx: jax.Array,   # [N,k] indices into the surface arrays
    nbr_valid: jax.Array, # [N,k]
    surf_xyz: jax.Array,
    surf_nrm: jax.Array,
    nbins: int = 11,
) -> jax.Array:
    """SPFH histograms [N, 3*nbins]; each block sums to 100 (reference:
    fpfh.hpp:64 computePointSPFHSignature, hist_incr = 100/(#neighbors))."""
    cap = surf_xyz.shape[0]
    idx = jnp.clip(nbr_idx, 0, cap - 1)
    p2 = surf_xyz[idx]                                  # [N,k,3]
    n2 = surf_nrm[idx]
    f1, f2, f3, f4, ok = pair_features(pts[:, None, :], nrm[:, None, :], p2, n2)
    valid = nbr_valid & ok & (f4 > 0.0)                 # excludes self (d=0)
    w = valid.astype(jnp.float32)
    cnt = jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1.0)
    incr = 100.0 * w / cnt
    h1 = _soft_hist(_bin_index(f1, -jnp.pi, jnp.pi, nbins), incr, nbins)
    h2 = _soft_hist(_bin_index(f2, -1.0, 1.0, nbins), incr, nbins)
    h3 = _soft_hist(_bin_index(f3, -1.0, 1.0, nbins), incr, nbins)
    return jnp.concatenate([h1, h2, h3], axis=-1)


def fpfh_from_spfh(
    spfh: jax.Array,      # [N, 33] (surface SPFH rows)
    nbr_idx: jax.Array,   # [N,k]
    nbr_d2: jax.Array,    # [N,k] squared distances
    nbr_valid: jax.Array, # [N,k]
    nbins: int = 11,
) -> jax.Array:
    """Distance-weighted neighbor SPFH sum, per-block renormalized to 100
    (reference: fpfh.hpp:110 weightPointSPFHSignature; weight = 1 / d^2 —
    the reference divides by the SQUARED kd-tree distance it gets from
    nearestKSearch (verified against the bun0 golden histogram,
    test_golden_features.py); the query's own SPFH excluded via d==0)."""
    n = spfh.shape[0]
    idx = jnp.clip(nbr_idx, 0, n - 1)
    valid = nbr_valid & (nbr_d2 > 0.0)
    wgt = jnp.where(valid, 1.0 / jnp.maximum(nbr_d2, _EPS), 0.0)
    acc = jnp.einsum("nk,nkb->nb", wgt, spfh[idx])
    out = []
    for b in range(3):
        blk = acc[:, b * nbins : (b + 1) * nbins]
        s = jnp.sum(blk, axis=-1, keepdims=True)
        out.append(jnp.where(s > 0, 100.0 * blk / jnp.maximum(s, _EPS), blk))
    return jnp.concatenate(out, axis=-1)


@partial(jax.jit, static_argnames=("k", "nbins", "backend"))
def estimate_fpfh(
    cloud: Cloud,
    k: int = 16,
    nbins: int = 11,
    backend: str = "bruteforce",
    cell_size: Optional[float] = None,
) -> jax.Array:
    """FPFH descriptors [capacity, 3*nbins] for every valid point.

    ``cloud`` must carry normals (features.estimate_normals). Neighborhoods
    are k-NN (PCL typically uses radius search; k-NN is the fixed-shape
    equivalent — pass a k chosen from the density).
    """
    if ATTR_NORMAL not in cloud.attrs:
        raise ValueError("estimate_fpfh requires normals")
    nrm = cloud.attrs[ATTR_NORMAL]
    if backend == "hashgrid":
        if cell_size is None:
            raise ValueError("hashgrid backend requires cell_size")
        grid = hashgrid_mod.build(cloud.xyz, cloud.mask, cell_size)
        idx, d2, valid, _ = hashgrid_mod.knn(grid, cloud.xyz, k)
    else:
        idx, d2, valid = bruteforce.knn(cloud.xyz, cloud.mask, cloud.xyz, k)
    valid = valid & cloud.mask[:, None]
    spfh = spfh_from_neighborhoods(
        cloud.xyz, nrm, idx, valid, cloud.xyz, nrm, nbins
    )
    fpfh = fpfh_from_spfh(spfh, idx, d2, valid, nbins)
    return jnp.where(cloud.mask[:, None], fpfh, 0.0)


@partial(jax.jit, static_argnames=("k", "nr_subdiv", "backend"))
def estimate_pfh(
    cloud: Cloud,
    k: int = 10,
    nr_subdiv: int = 5,
    backend: str = "bruteforce",
    cell_size: Optional[float] = None,
) -> jax.Array:
    """PFH descriptors [capacity, nr_subdiv^3] (PFHSignature125 for
    nr_subdiv=5; reference: features/include/pcl/features/impl/pfh.hpp
    computePointPFHSignature — joint histogram over ALL ordered neighbor
    pairs including the query point)."""
    if ATTR_NORMAL not in cloud.attrs:
        raise ValueError("estimate_pfh requires normals")
    nrm = cloud.attrs[ATTR_NORMAL]
    if backend == "hashgrid":
        if cell_size is None:
            raise ValueError("hashgrid backend requires cell_size")
        grid = hashgrid_mod.build(cloud.xyz, cloud.mask, cell_size)
        idx, d2, valid, _ = hashgrid_mod.knn(grid, cloud.xyz, k)
    else:
        idx, d2, valid = bruteforce.knn(cloud.xyz, cloud.mask, cloud.xyz, k)
    valid = valid & cloud.mask[:, None]
    cap = cloud.capacity
    idxc = jnp.clip(idx, 0, cap - 1)
    # neighborhood INCLUDES the query itself in PCL (it is its own neighbor
    # at d=0 from the search); pairs are over the k-neighborhood set
    pp = cloud.xyz[idxc]                               # [N,k,3]
    nn = nrm[idxc]
    f1, f2, f3, f4, ok = pair_features(
        pp[:, :, None, :], nn[:, :, None, :], pp[:, None, :, :], nn[:, None, :, :]
    )                                                   # [N,k,k]
    # each unordered pair once (upper triangle), both endpoints valid
    iu = jnp.triu(jnp.ones((idx.shape[1], idx.shape[1]), bool), 1)
    pv = valid[:, :, None] & valid[:, None, :] & ok & iu[None]
    w = pv.astype(jnp.float32)
    npairs = jnp.maximum(jnp.sum(w, axis=(-2, -1), keepdims=False), 1.0)
    b1 = _bin_index(f1, -jnp.pi, jnp.pi, nr_subdiv)
    b2 = _bin_index(f2, -1.0, 1.0, nr_subdiv)
    b3 = _bin_index(f3, -1.0, 1.0, nr_subdiv)
    # reference bin layout (impl/pfh.hpp h_index loop):
    # h = f1_idx + nr * f2_idx + nr^2 * f3_idx
    joint = b1 + nr_subdiv * (b2 + nr_subdiv * b3)      # [N,k,k]
    nb = nr_subdiv ** 3
    flatw = (100.0 * w / npairs[:, None, None]).reshape(w.shape[0], -1)
    hist = _soft_hist(joint.reshape(joint.shape[0], -1), flatw, nb)
    return jnp.where(cloud.mask[:, None], hist, 0.0)
