"""Correspondence grouping — cluster model->scene matches into instances.

- geometric_consistency_grouping (reference: recognition/include/pcl/
  recognition/cg/geometric_consistency.h + impl): two correspondences are
  geometrically consistent when their model-pair and scene-pair distances
  agree within ``gc_size``. PCL greedily grows clusters in correspondence
  order; here the full [C,C] consistency matrix is built in one batch and
  instances are extracted by repeatedly taking the largest consistent set
  (lax.scan over instances) — the batched form of the same greedy.
- hough3d_grouping (reference: cg/hough_3d.h): every correspondence votes
  for the model reference point's position in scene space; votes accumulate
  in a hashed 3D grid (segment_sum); grid peaks above the threshold become
  instances and their voters the member sets.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from pcl_tpu.core import geometry


class GroupingResult(NamedTuple):
    instances: jax.Array      # [I] bool — instance slot used
    members: jax.Array        # [I, C] bool — correspondences per instance
    transforms: jax.Array     # [I, 4, 4] model->scene rigid transforms


@partial(jax.jit, static_argnames=("max_instances", "min_cluster_size"))
def geometric_consistency_grouping(
    model_pts: jax.Array,     # [C,3] model keypoint per correspondence
    scene_pts: jax.Array,     # [C,3] matched scene keypoint
    valid: jax.Array,         # [C]
    gc_size: float = 0.01,
    min_cluster_size: int = 3,
    max_instances: int = 4,
) -> GroupingResult:
    C = model_pts.shape[0]
    dm = jnp.linalg.norm(model_pts[:, None, :] - model_pts[None, :, :], axis=-1)
    ds = jnp.linalg.norm(scene_pts[:, None, :] - scene_pts[None, :, :], axis=-1)
    consistent = (jnp.abs(dm - ds) < gc_size) & valid[:, None] & valid[None, :]

    def extract(used, _):
        avail = consistent & ~used[None, :] & ~used[:, None]
        counts = jnp.sum(avail, axis=1)
        seed = jnp.argmax(counts)
        members = avail[seed]
        ok = counts[seed] >= min_cluster_size
        members = members & ok
        w = members.astype(jnp.float32)
        T = geometry.umeyama(model_pts, scene_pts, w)
        T = jnp.where(ok, T, jnp.eye(4))
        return used | members, (ok, members, T)

    used0 = jnp.zeros((C,), bool)
    _, (ok, members, Ts) = jax.lax.scan(
        extract, used0, None, length=max_instances
    )
    return GroupingResult(instances=ok, members=members, transforms=Ts)


@partial(jax.jit, static_argnames=("max_instances", "table_size"))
def hough3d_grouping(
    model_pts: jax.Array,      # [C,3]
    scene_pts: jax.Array,      # [C,3]
    valid: jax.Array,          # [C]
    model_centroid: jax.Array,  # [3] the model reference point
    bin_size: float = 0.05,
    threshold: int = 3,
    max_instances: int = 4,
    table_size: int = 1 << 16,
) -> GroupingResult:
    """Simplified Hough voting: without per-point LRFs each correspondence
    votes with the TRANSLATION scene_pt + (centroid - model_pt) — exact for
    rotation-free instances, an approximation otherwise (the reference uses
    board LRFs to make votes rotation-invariant; pass rotated models for
    full generality)."""
    votes = scene_pts + (model_centroid[None, :] - model_pts)
    cell = jnp.floor(votes / bin_size).astype(jnp.int32)
    h = ((cell[:, 0] * 73856093) ^ (cell[:, 1] * 19349669) ^ (cell[:, 2] * 83492791))
    h = jnp.abs(h) % jnp.int32(table_size)
    h = jnp.where(valid, h, jnp.int32(table_size))
    counts = jax.ops.segment_sum(valid.astype(jnp.int32), h,
                                 num_segments=table_size + 1)[:table_size]

    def extract(state, _):
        counts_left, used = state
        peak = jnp.argmax(counts_left)
        n_votes = counts_left[peak]
        ok = n_votes >= threshold
        members = (h == peak) & valid & ~used & ok
        w = members.astype(jnp.float32)
        T = geometry.umeyama(model_pts, scene_pts, w)
        T = jnp.where(ok, T, jnp.eye(4))
        counts_left = counts_left.at[peak].set(0)
        return (counts_left, used | members), (ok, members, T)

    (_, _), (ok, members, Ts) = jax.lax.scan(
        extract, (counts, jnp.zeros_like(valid)), None, length=max_instances
    )
    return GroupingResult(instances=ok, members=members, transforms=Ts)
