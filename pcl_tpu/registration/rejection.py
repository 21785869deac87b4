"""Correspondence rejection — the reference's rejector chain as pure
mask-refining functions.

Equivalents of pcl::registration::CorrespondenceRejector* (reference:
registration/include/pcl/registration/correspondence_rejection*.h): each
function takes a Correspondences batch and returns it with ``valid``
tightened. They compose exactly like Registration's rejector chain
(reference impl/icp.hpp:188-200).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from pcl_tpu.registration.correspondence import Correspondences
from pcl_tpu.sac.models import RegistrationModel
from pcl_tpu.sac.ransac import ransac


def reject_distance(c: Correspondences, max_distance: float) -> Correspondences:
    """CorrespondenceRejectorDistance."""
    return c._replace(valid=c.valid & (c.sqdist <= max_distance**2))


def reject_median_distance(c: Correspondences, factor: float = 1.0) -> Correspondences:
    """CorrespondenceRejectorMedianDistance: keep pairs with
    d^2 <= factor * median(d^2) — the reference applies the factor to the
    correspondence ``distance`` values directly, which ARE squared
    (registration/src/correspondence_rejection_median_distance.cpp:60-66;
    golden-pinned in tests/test_golden_registration.py)."""
    d2 = jnp.where(c.valid, c.sqdist, jnp.nan)
    med = jnp.nanmedian(d2)
    return c._replace(valid=c.valid & (c.sqdist <= factor * med))


def reject_trimmed(c: Correspondences, overlap_ratio: float = 0.5) -> Correspondences:
    """CorrespondenceRejectorTrimmed: keep the closest fraction."""
    n_valid = jnp.sum(c.valid)
    k = jnp.maximum((overlap_ratio * n_valid).astype(jnp.int32), 1)
    d2 = jnp.where(c.valid, c.sqdist, jnp.inf)
    order = jnp.argsort(d2)
    rank = jnp.zeros_like(order).at[order].set(jnp.arange(order.shape[0]))
    return c._replace(valid=c.valid & (rank < k))


def reject_one_to_one(c: Correspondences) -> Correspondences:
    """CorrespondenceRejectorOneToOne: each target index keeps only its
    closest source."""
    n_tgt = jnp.max(c.index) + 1
    d2 = jnp.where(c.valid, c.sqdist, jnp.inf)
    # min distance per target index
    n = c.index.shape[0]
    tgt = jnp.where(c.valid, c.index, n)
    best = jax.ops.segment_min(d2, tgt, num_segments=n + 1)
    keep = c.valid & (d2 <= best[tgt])
    # break exact ties by source order
    pos = jnp.arange(n)
    first = jax.ops.segment_min(jnp.where(keep, pos, n), tgt, num_segments=n + 1)
    keep = keep & (pos == first[tgt])
    return c._replace(valid=keep)


def reject_surface_normals(
    c: Correspondences,
    src_normals: jax.Array,
    tgt_normals: jax.Array,
    threshold: float = 0.7,   # cos angle, reference default
) -> Correspondences:
    """CorrespondenceRejectorSurfaceNormal: normals must agree."""
    nt = tgt_normals[jnp.clip(c.index, 0, tgt_normals.shape[0] - 1)]
    cosang = jnp.sum(src_normals * nt, axis=-1)
    return c._replace(valid=c.valid & (cosang >= threshold))


def reject_sample_consensus(
    c: Correspondences,
    src_xyz: jax.Array,
    tgt_xyz: jax.Array,
    inlier_threshold: float = 0.05,
    n_hypotheses: int = 512,
    key: Optional[jax.Array] = None,
) -> Correspondences:
    """CorrespondenceRejectorSampleConsensus (reference:
    correspondence_rejection_sample_consensus.h:54): RANSAC a rigid
    transform over the correspondences, keep inliers."""
    tgt_of_src = tgt_xyz[jnp.clip(c.index, 0, tgt_xyz.shape[0] - 1)]
    res = ransac(
        RegistrationModel(), src_xyz, c.valid, inlier_threshold,
        key=key, n_hypotheses=n_hypotheses, target_xyz=tgt_of_src,
    )
    return c._replace(valid=c.valid & res.inliers)


def reject_polygon(
    c: Correspondences,
    src_xyz: jax.Array,
    tgt_xyz: jax.Array,
    cardinality: int = 3,
    similarity_threshold: float = 0.75,
    iterations: int = 256,
    key: Optional[jax.Array] = None,
) -> Correspondences:
    """CorrespondenceRejectorPoly (reference:
    correspondence_rejection_poly.h): sample random tuples of
    correspondences, vote for pairs whose polygon edge-length ratios match;
    keep correspondences with enough votes."""
    if key is None:
        key = jax.random.PRNGKey(0)
    n = src_xyz.shape[0]
    probs = c.valid.astype(jnp.float32)
    probs = probs / jnp.maximum(jnp.sum(probs), 1.0)
    idx = jax.random.categorical(
        key, jnp.log(probs + 1e-30)[None, :].repeat(iterations * cardinality, 0)
    ).reshape(iterations, cardinality).astype(jnp.int32)
    sp = src_xyz[idx]
    tp = tgt_xyz[jnp.clip(c.index[idx], 0, tgt_xyz.shape[0] - 1)]

    def edge_lengths(p):
        nxt = jnp.roll(p, -1, axis=1)
        return jnp.linalg.norm(nxt - p, axis=-1)

    es = edge_lengths(sp)
    et = edge_lengths(tp)
    ratio = jnp.minimum(es, et) / jnp.maximum(jnp.maximum(es, et), 1e-12)
    ok_poly = jnp.all(ratio >= similarity_threshold, axis=1)       # [I]
    votes = jax.ops.segment_sum(
        jnp.repeat(ok_poly.astype(jnp.int32), cardinality),
        idx.reshape(-1), num_segments=n,
    )
    trials = jax.ops.segment_sum(
        jnp.ones(iterations * cardinality, jnp.int32),
        idx.reshape(-1), num_segments=n,
    )
    frac = votes / jnp.maximum(trials, 1)
    # accept correspondences that pass in at least half their sampled polys
    keep = c.valid & ((trials == 0) | (frac >= 0.5))
    return c._replace(valid=keep)
