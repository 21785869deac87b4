"""Correspondence grouping — cluster model->scene matches into instances.

- geometric_consistency_grouping (reference: recognition/include/pcl/
  recognition/cg/geometric_consistency.h + impl): two correspondences are
  geometrically consistent when their model-pair and scene-pair distances
  agree within ``gc_size``. PCL greedily grows clusters in correspondence
  order; here the full [C,C] consistency matrix is built in one batch and
  instances are extracted by repeatedly taking the largest consistent set
  (lax.scan over instances) — the batched form of the same greedy.
- hough3d_grouping (reference: cg/hough_3d.h + impl + src/cg/hough_3d.cpp):
  every correspondence votes for the model reference point's position in
  scene space. With per-correspondence local reference frames the votes are
  rotation-invariant (train:105 stores centroid offsets in each model
  point's LRF; houghVoting:138 re-expresses them through the matched scene
  point's LRF). Votes splat trilinearly into a hashed 3D grid
  (HoughSpace3D::voteInt — 8-corner interpolation); peaks above the
  threshold become instances, their voters the member sets, and extracted
  voters retract their weight from every cell they touched (the batched
  analog of findMaxima's neighbor-local-maximum suppression).
- refine_grouping_sac: the reference's per-instance
  CorrespondenceRejectorSampleConsensus pass (geometric_consistency.hpp:
  118-140, hough_3d.hpp:273-295): RANSAC a rigid transform over each
  instance's correspondences, keep inliers, re-estimate by Umeyama over
  the inlier set.
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


@partial(jax.jit,
         static_argnames=("max_instances", "table_size", "use_interpolation",
                          "use_distance_weight"))
def hough3d_grouping(
    model_pts: jax.Array,      # [C,3]
    scene_pts: jax.Array,      # [C,3]
    valid: jax.Array,          # [C]
    model_centroid: jax.Array,  # [3] the model reference point
    bin_size: float = 0.05,
    threshold: float = 3.0,
    max_instances: int = 4,
    table_size: int = 1 << 16,
    model_rf: Optional[jax.Array] = None,   # [C,3,3] rows = x/y/z axes
    scene_rf: Optional[jax.Array] = None,   # [C,3,3]
    corr_distance: Optional[jax.Array] = None,  # [C] descriptor distances
    use_interpolation: bool = True,
    use_distance_weight: bool = False,
) -> GroupingResult:
    """Hough voting for model instances.

    With ``model_rf``/``scene_rf`` (BOARD or SHOT frames, rows = axes) the
    vote is the reference's rotation-invariant form (hough_3d.hpp:138):
    the centroid offset expressed in the model point's LRF, carried into
    scene space through the matched scene point's LRF. Without frames the
    vote degenerates to the translation-only form (exact for unrotated
    instances). ``use_interpolation`` splats each vote trilinearly over
    the 8 surrounding bins (HoughSpace3D::voteInt);
    ``use_distance_weight`` scales each vote by 1 - d/d_max of its
    correspondence distance (houghVoting:239)."""
    C = model_pts.shape[0]
    offset = model_centroid[None, :] - model_pts                  # [C,3]
    if model_rf is not None and scene_rf is not None:
        v_local = jnp.einsum("cij,cj->ci", model_rf, offset)
        votes = scene_pts + jnp.einsum("cji,cj->ci", scene_rf, v_local)
    else:
        votes = scene_pts + offset

    if use_distance_weight and corr_distance is not None:
        dmax = jnp.maximum(jnp.max(jnp.where(valid, corr_distance, 0.0)),
                           1e-12)
        weight = 1.0 - corr_distance / dmax
    else:
        weight = jnp.ones((C,), jnp.float32)
    weight = jnp.where(valid, weight, 0.0)

    # trilinear splat: central bin + the neighbor on the side of the vote
    # within each dim, weights (1 - frac) / frac per dim, 8 corner combos
    g = votes / bin_size
    cell = jnp.floor(g).astype(jnp.int32)                         # [C,3]
    frac = g - cell                                               # in [0,1)
    if use_interpolation:
        # distance from the bin centroid (at frac=0.5): weight toward the
        # centroid side, matching voteInt's (1 - |x - centroid|/bin)
        side = jnp.where(frac >= 0.5, 1, -1)                      # [C,3]
        w_central = 1.0 - jnp.abs(frac - 0.5)
        w_neigh = 1.0 - w_central
        corners = []
        cweights = []
        for bx in (0, 1):
            for by in (0, 1):
                for bz in (0, 1):
                    pick = jnp.array([bx, by, bz], jnp.int32)
                    c = cell + side * pick[None, :]
                    wxyz = jnp.where(pick[None, :] == 0, w_central, w_neigh)
                    corners.append(c)
                    cweights.append(jnp.prod(wxyz, axis=1))
        corners = jnp.stack(corners, axis=1)                      # [C,8,3]
        cweights = jnp.stack(cweights, axis=1) * weight[:, None]  # [C,8]
    else:
        corners = cell[:, None, :]
        cweights = weight[:, None]

    def cell_hash(c):
        h = ((c[..., 0] * 73856093) ^ (c[..., 1] * 19349669)
             ^ (c[..., 2] * 83492791))
        return jnp.abs(h) % jnp.int32(table_size)

    h = cell_hash(corners)                                        # [C,B]
    h = jnp.where(valid[:, None], h, jnp.int32(table_size))
    B = h.shape[1]
    counts = jax.ops.segment_sum(
        cweights.reshape(-1), h.reshape(-1),
        num_segments=table_size + 1)[:table_size]

    def extract(state, _):
        counts_left, used = state
        peak = jnp.argmax(counts_left)
        votes_here = counts_left[peak]
        ok = votes_here >= threshold
        touches = jnp.any((h == peak) & (cweights > 0), axis=1)
        members = touches & valid & ~used & ok
        w = members.astype(jnp.float32)
        T = geometry.umeyama(model_pts, scene_pts, w)
        T = jnp.where(ok, T, jnp.eye(4))
        # retract extracted voters' weight from every cell they touched
        retract = jnp.where(members[:, None], cweights, 0.0)
        counts_left = counts_left - jax.ops.segment_sum(
            retract.reshape(-1), h.reshape(-1),
            num_segments=table_size + 1)[:table_size]
        counts_left = jnp.maximum(counts_left, 0.0).at[peak].set(0.0)
        return (counts_left, used | members), (ok, members, T)

    (_, _), (ok, members, Ts) = jax.lax.scan(
        extract, (counts, jnp.zeros_like(valid)), None, length=max_instances
    )
    return GroupingResult(instances=ok, members=members, transforms=Ts)


def refine_grouping_sac(
    model_pts,
    scene_pts,
    result: GroupingResult,
    inlier_threshold: float,
    n_hypotheses: int = 4096,
    key=None,
) -> GroupingResult:
    """Per-instance RANSAC correspondence rejection + Umeyama re-estimate
    (the reference's CorrespondenceRejectorSampleConsensus pass both
    groupers apply before reporting transforms)."""
    from pcl_tpu.sac.models import RegistrationModel
    from pcl_tpu.sac.ransac import ransac

    if key is None:
        key = jax.random.PRNGKey(7)
    model_pts = jnp.asarray(model_pts, jnp.float32)
    scene_pts = jnp.asarray(scene_pts, jnp.float32)
    members = []
    transforms = []
    n_inst = int(result.instances.shape[0])
    for i in range(n_inst):
        if not bool(result.instances[i]):
            members.append(result.members[i])
            transforms.append(result.transforms[i])
            continue
        m = result.members[i]
        res = ransac(
            RegistrationModel(), model_pts, m, inlier_threshold,
            key=jax.random.fold_in(key, i), n_hypotheses=n_hypotheses,
            target_xyz=scene_pts)
        inl = res.inliers & m
        # guard: keep the original cluster if RANSAC collapsed
        good = jnp.sum(inl) >= 3
        inl = jnp.where(good, inl, m)
        T = geometry.umeyama(model_pts, scene_pts, inl.astype(jnp.float32))
        members.append(inl)
        transforms.append(T)
    return GroupingResult(
        instances=result.instances,
        members=jnp.stack(members),
        transforms=jnp.stack(transforms),
    )
