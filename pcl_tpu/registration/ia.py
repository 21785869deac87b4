"""Feature-based initial alignment — SAC-IA and prerejective RANSAC.

TPU-native re-designs of:
- pcl::SampleConsensusInitialAlignment (reference: registration/include/pcl/
  registration/ia_ransac.h:54, impl/ia_ransac.hpp:217-290): random source
  samples -> random among k similar target features -> Umeyama -> truncated
  error, keep best. PCL's sequential iterations become one batch of B
  hypotheses; the error metric is evaluated on a fixed random subset of
  source points against 1-NN in the target (the whole [B] scoring is two
  einsums).
- pcl::SampleConsensusPrerejective (reference:
  sample_consensus_prerejective.h:75): adds the polygon side-length-ratio
  prerejection (correspondence_rejection_poly.h) before scoring; here the
  prerejection simply masks hypotheses in the batch.

Feature matching is exact k-NN in descriptor space via an MXU matmul
(the FLANN feature tree replacement).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from pcl_tpu.core.cloud import Cloud
from pcl_tpu.core import geometry
from pcl_tpu.core.transforms import transform_points
from pcl_tpu.search import bruteforce


def feature_knn(
    src_feat: jax.Array, src_mask: jax.Array,
    tgt_feat: jax.Array, tgt_mask: jax.Array,
    k: int,
) -> jax.Array:
    """[N,D] x [M,D] -> [N,k] indices of most similar target features
    (L2 in descriptor space, the reference's feature kd-tree query)."""
    s2 = jnp.sum(src_feat * src_feat, axis=-1)
    t2 = jnp.sum(tgt_feat * tgt_feat, axis=-1)
    d = s2[:, None] + t2[None, :] - 2.0 * (src_feat @ tgt_feat.T)
    d = jnp.where(tgt_mask[None, :], d, jnp.inf)
    d = jnp.where(src_mask[:, None], d, jnp.inf)
    _neg, idx = jax.lax.top_k(-d, k)
    return idx.astype(jnp.int32)


class IAResult(NamedTuple):
    transform: jax.Array     # [4,4]
    error: jax.Array         # f32 truncated-error score of the best hypothesis
    valid: jax.Array         # bool


def _batched_nn_d2(Ts, sub_xyz, tgt_xyz, tgt_mask):
    """NN squared distances of a subset under EVERY hypothesis: [B,S].
    All B*S transformed points go through one flat 1-NN sweep (a vmapped
    nn1 would materialize per-hypothesis distance blocks and OOM)."""
    p = jax.vmap(lambda T: transform_points(T, sub_xyz))(Ts)     # [B,S,3]
    B, S, _ = p.shape
    _idx, d2 = bruteforce.nn1(tgt_xyz, tgt_mask, p.reshape(B * S, 3))
    return d2.reshape(B, S)


@partial(
    jax.jit,
    static_argnames=("n_hypotheses", "k_corr", "sample_size", "n_eval"),
)
def sac_ia(
    source: Cloud,
    source_features: jax.Array,
    target: Cloud,
    target_features: jax.Array,
    *,
    key: Optional[jax.Array] = None,
    n_hypotheses: int = 512,
    k_corr: int = 10,
    sample_size: int = 3,
    min_sample_distance: float = 0.0,
    error_threshold: Optional[float] = None,
    n_eval: int = 512,
) -> IAResult:
    """Coarse feature alignment. ``*_features`` are [capacity, D] rows
    aligned with the clouds. Returns the best rigid transform."""
    if key is None:
        key = jax.random.PRNGKey(0)
    sx, sm = source.xyz, source.mask
    tx, tm = target.xyz, target.mask
    if error_threshold is None:
        # reference default: truncation at 3 * max_corr_dist-ish scale; use
        # a data scale proxy = 1/4 of the target bounding diagonal
        span = jnp.max(jnp.where(tm[:, None], tx, -jnp.inf), axis=0) - \
               jnp.min(jnp.where(tm[:, None], tx, jnp.inf), axis=0)
        thr = 0.25 * jnp.linalg.norm(span)
    else:
        thr = jnp.float32(error_threshold)

    # one feature-space kNN for every source point (amortized over hypotheses)
    cand = feature_knn(source_features, sm, target_features, tm, k_corr)  # [N,k]

    n = source.capacity
    k_smp, k_pick, k_sub = jax.random.split(key, 3)
    probs = sm.astype(jnp.float32)
    probs = probs / jnp.maximum(jnp.sum(probs), 1.0)
    # [B, m] random source indices
    sidx = jax.random.categorical(
        k_smp, jnp.log(probs + 1e-30)[None, :].repeat(n_hypotheses * sample_size, 0)
    ).reshape(n_hypotheses, sample_size).astype(jnp.int32)
    # pick one of the k similar features per sampled point
    pick = jax.random.randint(k_pick, (n_hypotheses, sample_size), 0, k_corr)
    tidx = jnp.take_along_axis(cand[sidx].reshape(n_hypotheses, sample_size, -1),
                               pick[..., None], axis=-1)[..., 0]

    src_s = sx[sidx]                                    # [B,m,3]
    tgt_s = tx[jnp.clip(tidx, 0, target.capacity - 1)]
    # optional min-distance sample rejection (reference selectSamples):
    # degenerate (too-close) samples score as +inf
    pd = jnp.linalg.norm(src_s[:, :, None, :] - src_s[:, None, :, :], axis=-1)
    iu = jnp.triu(jnp.ones((sample_size, sample_size), bool), 1)
    min_pd = jnp.min(jnp.where(iu[None], pd, jnp.inf), axis=(1, 2))
    sample_ok = min_pd >= min_sample_distance

    w = jnp.ones((n_hypotheses, sample_size), jnp.float32)
    Ts = geometry.umeyama(src_s, tgt_s, w)              # [B,4,4]

    # score on a fixed random valid subset of source points
    sub = jax.random.categorical(
        k_sub, jnp.log(probs + 1e-30)[None, :].repeat(n_eval, 0)
    ).astype(jnp.int32)
    sub_xyz = sx[sub]
    d2 = _batched_nn_d2(Ts, sub_xyz, tx, tm)
    errs = jnp.mean(jnp.minimum(jnp.sqrt(jnp.maximum(d2, 0.0)), thr), axis=1)
    errs = jnp.where(sample_ok & jnp.isfinite(Ts).all(axis=(1, 2)), errs, jnp.inf)
    best = jnp.argmin(errs)
    return IAResult(
        transform=Ts[best],
        error=errs[best],
        valid=jnp.isfinite(errs[best]),
    )


@partial(
    jax.jit,
    static_argnames=("n_hypotheses", "k_corr", "n_eval"),
)
def prerejective_ransac(
    source: Cloud,
    source_features: jax.Array,
    target: Cloud,
    target_features: jax.Array,
    *,
    key: Optional[jax.Array] = None,
    n_hypotheses: int = 2048,
    k_corr: int = 5,
    similarity_threshold: float = 0.9,
    inlier_threshold: float = 0.05,
    n_eval: int = 1024,
) -> IAResult:
    """SampleConsensusPrerejective: 3-point hypotheses with polygon
    side-ratio prerejection, scored by inlier fraction on a subset.

    similarity_threshold: min ratio between matched triangle edge lengths
    (reference CorrespondenceRejectorPoly cardinality-3 test)."""
    if key is None:
        key = jax.random.PRNGKey(0)
    sx, sm = source.xyz, source.mask
    tx, tm = target.xyz, target.mask

    cand = feature_knn(source_features, sm, target_features, tm, k_corr)

    n = source.capacity
    k_smp, k_pick, k_sub = jax.random.split(key, 3)
    probs = sm.astype(jnp.float32)
    probs = probs / jnp.maximum(jnp.sum(probs), 1.0)
    m = 3
    sidx = jax.random.categorical(
        k_smp, jnp.log(probs + 1e-30)[None, :].repeat(n_hypotheses * m, 0)
    ).reshape(n_hypotheses, m).astype(jnp.int32)
    pick = jax.random.randint(k_pick, (n_hypotheses, m), 0, k_corr)
    tidx = jnp.take_along_axis(cand[sidx].reshape(n_hypotheses, m, -1),
                               pick[..., None], axis=-1)[..., 0]
    src_s = sx[sidx]
    tgt_s = tx[jnp.clip(tidx, 0, target.capacity - 1)]

    # polygon prerejection: each corresponding edge-length ratio must exceed
    # the similarity threshold both ways
    def edges(p):
        e = jnp.stack([
            p[:, 1] - p[:, 0], p[:, 2] - p[:, 1], p[:, 0] - p[:, 2]
        ], axis=1)
        return jnp.linalg.norm(e, axis=-1)                  # [B,3]

    es, et = edges(src_s), edges(tgt_s)
    ratio = jnp.minimum(es, et) / jnp.maximum(jnp.maximum(es, et), 1e-12)
    poly_ok = jnp.all(ratio >= similarity_threshold, axis=1)

    w = jnp.ones((n_hypotheses, m), jnp.float32)
    Ts = geometry.umeyama(src_s, tgt_s, w)

    sub = jax.random.categorical(
        k_sub, jnp.log(probs + 1e-30)[None, :].repeat(n_eval, 0)
    ).astype(jnp.int32)
    sub_xyz = sx[sub]
    d2 = _batched_nn_d2(Ts, sub_xyz, tx, tm)
    score = jnp.mean((d2 <= inlier_threshold ** 2).astype(jnp.float32), axis=1)
    score = jnp.where(poly_ok & jnp.isfinite(Ts).all(axis=(1, 2)), score, -jnp.inf)
    best = jnp.argmax(score)
    return IAResult(
        transform=Ts[best],
        error=1.0 - score[best],
        valid=jnp.isfinite(score[best]),
    )
