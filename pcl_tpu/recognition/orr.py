"""ObjRecRANSAC-style utilities — trimmed ICP and distance/mask maps.

- ``trimmed_icp``: pcl::recognition::TrimmedICP (reference: recognition/
  include/pcl/recognition/ransac_based/trimmed_icp.h) — ICP that fits only
  the best fraction of correspondences each iteration (robust to partial
  overlap/outliers). The align loop is a jit'd lax.while_loop: 1-NN, sort
  by distance, keep the closest ``trim_fraction`` (via threshold at the
  trimmed quantile — rank selection without dynamic shapes), Umeyama.
- ``obj_rec_ransac``: the reference's ransac_based/obj_rec_ransac.h samples
  oriented point pairs from the scene, matches them against a model pair
  table (same machinery as PPF registration), hypothesizes rigid poses,
  and accepts by support. Here: batched hypothesis generation from random
  scene pairs + batched support evaluation, reusing the PPF hash table.
- ``distance_map``: recognition/include/pcl/recognition/distance_map.h —
  L2 distance transform of a binary mask (two-pass separable squared-
  distance transform, vectorized per row/column).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pcl_tpu.core.cloud import Cloud
from pcl_tpu.core import geometry, transforms
from pcl_tpu.search import bruteforce


class TrimmedICPResult(NamedTuple):
    transform: jax.Array   # [4,4]
    mse: jax.Array         # trimmed mean squared error
    iterations: jax.Array


@partial(jax.jit, static_argnames=("max_iterations",))
def trimmed_icp(
    source: Cloud,
    target: Cloud,
    trim_fraction: float = 0.4,
    max_iterations: int = 30,
    tolerance: float = 1e-7,
    init: Optional[jax.Array] = None,
) -> TrimmedICPResult:
    """Align source to target using only the closest ``trim_fraction`` of
    points each iteration (trimmed_icp.h align(source, num_points, T))."""
    sx, sm = source.xyz, source.mask
    tx, tm = target.xyz, target.mask
    T0 = jnp.eye(4, dtype=jnp.float32) if init is None else init.astype(jnp.float32)
    n_valid = jnp.maximum(sm.sum(), 1)

    def body(state):
        T, prev_mse, it, _ = state
        cur = transforms.transform_points(T, sx)
        idx, d2 = bruteforce.nn1(tx, tm, cur)
        d2 = jnp.where(sm & (idx >= 0), d2, jnp.inf)
        # trimmed threshold = quantile of valid distances
        k = jnp.maximum((trim_fraction * n_valid).astype(jnp.int32), 3)
        sorted_d2 = jnp.sort(d2)
        thr = sorted_d2[jnp.clip(k - 1, 0, d2.shape[0] - 1)]
        keep = (d2 <= thr) & jnp.isfinite(d2)
        w = keep.astype(jnp.float32)
        tgt_pts = tx[jnp.clip(idx, 0, tx.shape[0] - 1)]
        Tinc = geometry.umeyama(cur, tgt_pts, w)
        T_new = Tinc @ T
        mse = jnp.sum(w * d2) / jnp.maximum(w.sum(), 1.0)
        return T_new, mse, it + 1, jnp.abs(prev_mse - mse)

    def cond(state):
        _, _, it, delta = state
        return (it < max_iterations) & (delta > tolerance)

    T, mse, it, _ = jax.lax.while_loop(
        cond, body, (T0, jnp.float32(jnp.inf), 0, jnp.float32(jnp.inf))
    )
    return TrimmedICPResult(T, mse, it)


@partial(jax.jit, static_argnames=("n_hypotheses",))
def _orr_hypotheses(key, sxyz, smask, snormals, mxyz, mmask, mnormals,
                    pair_dist, dist_tol, n_hypotheses):
    """Sample scene point pairs at ~pair_dist apart; for each, find the
    best-matching model pair by PPF-style (d, angles) agreement and build
    a rigid transform hypothesis."""
    n_s = sxyz.shape[0]
    n_m = mxyz.shape[0]
    k1, k2 = jax.random.split(key)
    p_valid = smask.astype(jnp.float32)
    i1 = jax.random.categorical(k1, jnp.log(p_valid + 1e-9), shape=(n_hypotheses,))
    # second point: near the pair distance from the first
    d = jnp.linalg.norm(sxyz[None, :, :] - sxyz[i1][:, None, :], axis=-1)
    ok = smask[None, :] & (jnp.abs(d - pair_dist) < dist_tol)
    logits = jnp.where(ok, 0.0, -1e9)
    i2 = jax.random.categorical(k2, logits, axis=-1)

    def ppf_feat(p1, n1, p2, n2):
        dv = p2 - p1
        dn = jnp.linalg.norm(dv, axis=-1, keepdims=True) + 1e-12
        u = dv / dn
        return jnp.stack(
            [
                dn[..., 0],
                jnp.arccos(jnp.clip(jnp.sum(n1 * u, -1), -1, 1)),
                jnp.arccos(jnp.clip(jnp.sum(n2 * u, -1), -1, 1)),
                jnp.arccos(jnp.clip(jnp.sum(n1 * n2, -1), -1, 1)),
            ],
            axis=-1,
        )

    sf = ppf_feat(sxyz[i1], snormals[i1], sxyz[i2], snormals[i2])  # [Hyp,4]

    # all model pairs at compatible distance (subsample: first 64 per hyp)
    mi = jnp.arange(n_m)
    mj = (mi[:, None] + mi[None, :]) * 0  # placeholder, replaced below

    # brute-force model pair table [n_m, n_m, 4] is too big; sample pairs
    km = jax.random.split(key, 3)[2]
    mp1 = jax.random.randint(km, (512,), 0, n_m)
    dmm = jnp.linalg.norm(mxyz[None, :, :] - mxyz[mp1][:, None, :], axis=-1)
    okm = mmask[None, :] & (jnp.abs(dmm - pair_dist) < dist_tol)
    mp2 = jnp.argmax(okm, axis=-1)
    mp_ok = jnp.take_along_axis(okm, mp2[:, None], axis=1)[:, 0] & mmask[mp1]
    mf = ppf_feat(mxyz[mp1], mnormals[mp1], mxyz[mp2], mnormals[mp2])  # [512,4]

    # match each scene pair to the closest model pair in feature space
    fd = jnp.sum((sf[:, None, :] - mf[None]) ** 2, axis=-1)
    fd = jnp.where(mp_ok[None, :], fd, jnp.inf)
    best = jnp.argmin(fd, axis=1)

    # rigid transform from 2 point + 2 normal correspondences per hypothesis
    def pair_frame(p1, p2, n1):
        x = p2 - p1
        x = x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + 1e-12)
        z = n1 - jnp.sum(n1 * x, -1, keepdims=True) * x
        z = z / (jnp.linalg.norm(z, axis=-1, keepdims=True) + 1e-12)
        y = jnp.cross(z, x)
        return jnp.stack([x, y, z], axis=-1)  # [...,3,3]

    Rs = pair_frame(sxyz[i1], sxyz[i2], snormals[i1])
    Rm = pair_frame(mxyz[mp1][best], mxyz[mp2][best], mnormals[mp1][best])
    R = Rs @ jnp.swapaxes(Rm, -1, -2)
    t = sxyz[i1] - jnp.einsum("hij,hj->hi", R, mxyz[mp1][best])
    T = jnp.tile(jnp.eye(4), (n_hypotheses, 1, 1))
    T = T.at[:, :3, :3].set(R).at[:, :3, 3].set(t)
    return T


@partial(jax.jit, static_argnames=())
def _orr_support(T, mxyz, mmask, sxyz, smask, inlier_dist):
    def one(Ti):
        cur = transforms.transform_points(Ti, mxyz)
        idx, d2 = bruteforce.nn1(sxyz, smask, cur)
        hit = mmask & (d2 <= inlier_dist * inlier_dist)
        return hit.sum() / jnp.maximum(mmask.sum(), 1)

    return jax.lax.map(one, T)


def obj_rec_ransac(
    model: Cloud,
    scene: Cloud,
    pair_dist: float,
    n_hypotheses: int = 256,
    dist_tol: float = 0.05,
    inlier_dist: float = 0.05,
    refine: bool = True,
    seed: int = 0,
):
    """Detect `model` in `scene`; returns (T [4,4], support in [0,1]).
    Both clouds need normals (obj_rec_ransac.h recognize())."""
    from pcl_tpu.core.cloud import ATTR_NORMAL

    key = jax.random.PRNGKey(seed)
    T = _orr_hypotheses(
        key,
        scene.xyz, scene.mask, scene.attrs[ATTR_NORMAL],
        model.xyz, model.mask, model.attrs[ATTR_NORMAL],
        jnp.float32(pair_dist), jnp.float32(dist_tol), n_hypotheses,
    )
    support = _orr_support(T, model.xyz, model.mask, scene.xyz, scene.mask,
                           jnp.float32(inlier_dist))
    best = int(jnp.argmax(support))
    T_best = T[best]
    s_best = float(support[best])
    if refine:
        res = trimmed_icp(model, scene, trim_fraction=0.7, init=T_best)
        T_best = res.transform
        support2 = _orr_support(
            T_best[None], model.xyz, model.mask, scene.xyz, scene.mask,
            jnp.float32(inlier_dist),
        )
        s_best = float(support2[0])
    return np.asarray(T_best), s_best


@jax.jit
def distance_map(mask_img: jax.Array) -> jax.Array:
    """Euclidean distance transform of a [H,W] bool mask (distance to the
    nearest True pixel), via the two-pass separable squared-distance
    transform (Felzenszwalb–Huttenlocher restructured as a min-plus scan
    per axis, vectorized across rows/columns)."""
    H, W = mask_img.shape
    INF = jnp.float32(1e10)

    # pass 1: per column, 1D distance along y — forward/backward scans
    d = jnp.where(mask_img, 0.0, INF)

    def fwd(carry, row):
        c = jnp.minimum(row, carry + 1.0)
        return c, c

    _, down = jax.lax.scan(fwd, jnp.full((W,), INF), d)
    _, up = jax.lax.scan(fwd, jnp.full((W,), INF), d[::-1])
    dy = jnp.minimum(down, up[::-1])  # [H,W] vertical distance

    # pass 2: per row, combine dy^2 with horizontal offset^2 (brute min over
    # x' — one [W,W] matrix per image, fine for map-sized W and MXU-friendly)
    xs = jnp.arange(W, dtype=jnp.float32)
    off2 = (xs[:, None] - xs[None, :]) ** 2
    d2 = jnp.min(dy[:, None, :] ** 2 + off2[None], axis=-1)
    return jnp.sqrt(d2)


def sample_oriented_point_pairs(
    cloud: Cloud,
    pair_dist: float,
    n_pairs: int = 256,
    dist_tol: float = 0.05,
    seed: int = 0,
):
    """Sample oriented point pairs ~``pair_dist`` apart, the ObjRecRANSAC
    sampling primitive (reference: ransac_based/obj_rec_ransac.h
    sampleOrientedPointPairs). Requires normals.

    Returns (i1 [P] int32, i2 [P] int32, valid [P] bool) — indices into the
    cloud; ``valid`` is False where no partner at the pair distance exists.
    """
    from pcl_tpu.core.cloud import ATTR_NORMAL
    if ATTR_NORMAL not in cloud.attrs:
        raise ValueError("sample_oriented_point_pairs requires normals")
    key = jax.random.PRNGKey(seed)
    k1, k2 = jax.random.split(key)
    xyz, mask = cloud.xyz, cloud.mask
    p_valid = mask.astype(jnp.float32)
    i1 = jax.random.categorical(k1, jnp.log(p_valid + 1e-9), shape=(n_pairs,))
    d = jnp.linalg.norm(xyz[None, :, :] - xyz[i1][:, None, :], axis=-1)
    ok = mask[None, :] & (jnp.abs(d - pair_dist) < dist_tol)
    logits = jnp.where(ok, 0.0, -1e9)
    i2 = jax.random.categorical(k2, logits, axis=-1)
    valid = jnp.take_along_axis(ok, i2[:, None], axis=1)[:, 0] & mask[i1]
    return i1.astype(jnp.int32), i2.astype(jnp.int32), valid


def pair_feature_hash_table(
    cloud: Cloud,
    pair_dist: float,
    n_pairs: int = 2048,
    dist_tol: float = 0.05,
    n_bins: int = 16,
    seed: int = 0,
):
    """Histogram of PPF angle features over sampled model pairs — the
    occupancy statistics of the ObjRecRANSAC model hash table (reference:
    ransac_based/model_library.h addToHashTable; cells keyed by the three
    discretized angles). Returns (hist [n_bins,n_bins,n_bins] int32,
    n_valid_pairs int)."""
    from pcl_tpu.core.cloud import ATTR_NORMAL
    i1, i2, valid = sample_oriented_point_pairs(
        cloud, pair_dist, n_pairs, dist_tol, seed)
    xyz, nrm = cloud.xyz, cloud.attrs[ATTR_NORMAL]
    dv = xyz[i2] - xyz[i1]
    u = dv / (jnp.linalg.norm(dv, axis=-1, keepdims=True) + 1e-12)
    ang = jnp.stack([
        jnp.arccos(jnp.clip(jnp.sum(nrm[i1] * u, -1), -1, 1)),
        jnp.arccos(jnp.clip(jnp.sum(nrm[i2] * u, -1), -1, 1)),
        jnp.arccos(jnp.clip(jnp.sum(nrm[i1] * nrm[i2], -1), -1, 1)),
    ], axis=-1)                                        # [P,3] in [0,pi]
    bins = jnp.clip((ang / jnp.pi * n_bins).astype(jnp.int32), 0, n_bins - 1)
    lin = (bins[:, 0] * n_bins + bins[:, 1]) * n_bins + bins[:, 2]
    lin = jnp.where(valid, lin, n_bins ** 3)
    hist = jnp.zeros((n_bins ** 3 + 1,), jnp.int32).at[lin].add(1)
    return (np.asarray(hist[:-1]).reshape(n_bins, n_bins, n_bins),
            int(jnp.sum(valid.astype(jnp.int32))))


def mask_difference(mask0: jax.Array, mask1: jax.Array) -> jax.Array:
    """XOR difference of two binary masks (reference:
    recognition/mask_map.h:81 MaskMap::getDifferenceMask)."""
    return jnp.logical_xor(mask0.astype(bool), mask1.astype(bool))


def mask_erode(mask_img: jax.Array, size: int = 3) -> jax.Array:
    """Binary erosion of a mask image (reference: mask_map.h:121
    MaskMap::erode) via the shared 2d morphology kernel."""
    from pcl_tpu.image.ops import erode
    return erode(mask_img.astype(jnp.float32), size=size) > 0.5
