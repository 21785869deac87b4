"""Correspondence estimation — batched 1-NN matching.

Equivalent of pcl::registration::CorrespondenceEstimation
(reference: registration/impl/correspondence_estimation.hpp:147-267).
PCL loops point-by-point over a k-d tree; here the whole source cloud is
matched in one MXU-tiled 1-NN sweep. Fixed-shape output: per-source-point
target index + squared distance + validity (distance gate + masks).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from pcl_tpu.search import bruteforce


class Correspondences(NamedTuple):
    """match[i] = target index for source point i (aligned shapes)."""
    index: jax.Array    # [N] int32 target index
    sqdist: jax.Array   # [N] f32
    valid: jax.Array    # [N] bool


def determine_correspondences(
    src_xyz: jax.Array,
    src_mask: jax.Array,
    tgt_xyz: jax.Array,
    tgt_mask: jax.Array,
    max_dist: float = jnp.inf,
) -> Correspondences:
    """1-NN in the target for every source point, gated by max distance."""
    idx, d2 = bruteforce.nn1(tgt_xyz, tgt_mask, src_xyz)
    max_d2 = jnp.float32(max_dist) ** 2
    valid = src_mask & jnp.isfinite(d2) & (d2 <= max_d2)
    return Correspondences(idx.astype(jnp.int32), d2, valid)


def determine_reciprocal_correspondences(
    src_xyz: jax.Array,
    src_mask: jax.Array,
    tgt_xyz: jax.Array,
    tgt_mask: jax.Array,
    max_dist: float = jnp.inf,
) -> Correspondences:
    """Keep only pairs that are mutual nearest neighbors (reference:
    correspondence_estimation.hpp:259-267)."""
    fwd = determine_correspondences(src_xyz, src_mask, tgt_xyz, tgt_mask, max_dist)
    back_idx, _ = bruteforce.nn1(src_xyz, src_mask, tgt_xyz)
    n = src_xyz.shape[0]
    mutual = back_idx[jnp.clip(fwd.index, 0, tgt_xyz.shape[0] - 1)] == jnp.arange(n)
    return Correspondences(fwd.index, fwd.sqdist, fwd.valid & mutual)


def correspondence_normal_shooting(
    src_xyz: jax.Array,
    src_mask: jax.Array,
    src_normals: jax.Array,
    tgt_xyz: jax.Array,
    tgt_mask: jax.Array,
    k: int = 10,
    max_dist: float = jnp.inf,
) -> Correspondences:
    """Among the k nearest target points, pick the one closest to the line
    through the source point along its normal (reference:
    correspondence_estimation_normal_shooting.h)."""
    idx, d2, valid = bruteforce.knn(tgt_xyz, tgt_mask, src_xyz, k)
    cand = tgt_xyz[jnp.clip(idx, 0, tgt_xyz.shape[0] - 1)]          # [N,k,3]
    diff = cand - src_xyz[:, None, :]
    n = src_normals / jnp.maximum(jnp.linalg.norm(src_normals, axis=-1, keepdims=True), 1e-12)
    along = jnp.einsum("nkj,nj->nk", diff, n)
    perp2 = jnp.sum(diff * diff, axis=-1) - along * along
    perp2 = jnp.where(valid, perp2, jnp.inf)
    best = jnp.argmin(perp2, axis=1)
    bidx = jnp.take_along_axis(idx, best[:, None], axis=1)[:, 0]
    bd2 = jnp.take_along_axis(d2, best[:, None], axis=1)[:, 0]
    ok = src_mask & jnp.isfinite(bd2) & (bd2 <= jnp.float32(max_dist) ** 2)
    return Correspondences(bidx.astype(jnp.int32), bd2, ok)
