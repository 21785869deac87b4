"""Implicit Shape Model — codebook voting for object-center detection.

Capability match for pcl::features::ISMVoteList / pcl::ism::
ImplicitShapeModelEstimation (reference: recognition/include/pcl/recognition
/implicit_shape_model.h — built in recognition, include path under
features). Training clusters per-point descriptors of annotated training
clouds into a k-means codebook; each codebook entry stores the set of
offsets from its member points to their object center (+ class weights).
At query time every scene point activates its nearest codebook entry and
casts the stored center votes; a Gaussian-kernel density over the votes
(``find_strongest_peaks``) yields object-center candidates.

All stages are batched: descriptor->codeword assignment is one pairwise
distance argmin; vote density evaluation is one [peaks, votes] kernel sum.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pcl_tpu.ml.kmeans import kmeans


@dataclass
class ISMModel:
    codebook: np.ndarray        # [K,D] descriptor centroids
    vote_offsets: np.ndarray    # [V,3] center - point, in the LRF-free frame
    vote_codeword: np.ndarray   # [V] int32 codeword of each vote
    vote_class: np.ndarray      # [V] int32
    vote_weight: np.ndarray     # [V] f32 (statistical weights, eq. 7)
    n_classes: int
    sigma: float                # kernel bandwidth for vote density


def train_ism(
    descriptors_per_object: List[np.ndarray],
    points_per_object: List[np.ndarray],
    centers: List[np.ndarray],
    classes: List[int],
    n_clusters: int = 32,
    sigma: float = 0.1,
) -> ISMModel:
    """Cluster descriptors into a codebook; store center-offset votes per
    codeword (implicit_shape_model.hpp trainISM: clusterDescriptors +
    calculateWeights)."""
    all_desc = np.concatenate(descriptors_per_object).astype(np.float32)
    all_off = np.concatenate(
        [np.asarray(c)[None, :] - np.asarray(p) for p, c in zip(points_per_object, centers)]
    ).astype(np.float32)
    all_cls = np.concatenate(
        [np.full(len(p), cl) for p, cl in zip(points_per_object, classes)]
    ).astype(np.int32)

    k = min(n_clusters, len(all_desc))
    cb, labels, _ = kmeans(
        jnp.asarray(all_desc), jnp.ones((len(all_desc),), bool), k,
        max_iterations=30,
    )
    labels = np.asarray(labels)

    # statistical weights: votes from rarer (codeword, class) pairs weigh more
    w = np.ones(len(all_desc), np.float32)
    for kw in range(k):
        m = labels == kw
        if m.any():
            w[m] = 1.0 / m.sum()
    return ISMModel(
        np.asarray(cb), all_off, labels.astype(np.int32), all_cls, w,
        int(max(classes)) + 1, sigma,
    )


@jax.jit
def _cast_votes(desc, codebook, vote_offsets, vote_codeword, vote_weight,
                points):
    """For each scene point: nearest codeword, then all of that codeword's
    votes land at point + offset. Returns flattened vote positions [P*Vmax?]
    — instead we return per-point codeword and let the host expand (vote
    counts per codeword are ragged)."""
    d = jnp.sum((desc[:, None, :] - codebook[None]) ** 2, axis=-1)
    return jnp.argmin(d, axis=1)


def find_objects(
    model: ISMModel,
    scene_descriptors: np.ndarray,
    scene_points: np.ndarray,
    target_class: int,
    n_peaks: int = 3,
) -> List[Tuple[np.ndarray, float]]:
    """Cast votes for ``target_class`` and return up to n_peaks
    (center, density) object hypotheses (ISMVoteList::findStrongestPeaks)."""
    cw = np.asarray(
        _cast_votes(
            jnp.asarray(scene_descriptors, jnp.float32),
            jnp.asarray(model.codebook),
            jnp.asarray(model.vote_offsets),
            jnp.asarray(model.vote_codeword),
            jnp.asarray(model.vote_weight),
            jnp.asarray(scene_points, jnp.float32),
        )
    )
    votes, weights = [], []
    cls_mask = model.vote_class == target_class
    for i, c in enumerate(cw):
        m = (model.vote_codeword == c) & cls_mask
        if m.any():
            votes.append(scene_points[i][None, :] + model.vote_offsets[m])
            weights.append(model.vote_weight[m])
    if not votes:
        return []
    votes = np.concatenate(votes)
    weights = np.concatenate(weights)

    # kernel density over votes, evaluated at the votes themselves
    v = jnp.asarray(votes)
    w = jnp.asarray(weights)
    d2 = jnp.sum((v[:, None, :] - v[None]) ** 2, axis=-1)
    dens = np.asarray((jnp.exp(-d2 / (2 * model.sigma**2)) * w[None]).sum(axis=1))

    peaks: List[Tuple[np.ndarray, float]] = []
    alive = np.ones(len(votes), bool)
    for _ in range(n_peaks):
        if not alive.any():
            break
        i = int(np.argmax(np.where(alive, dens, -np.inf)))
        if dens[i] <= 0:
            break
        peaks.append((votes[i], float(dens[i])))
        near = np.linalg.norm(votes - votes[i], axis=1) < 2 * model.sigma
        alive &= ~near
    return peaks
