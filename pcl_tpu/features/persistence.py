"""Multiscale feature persistence.

Equivalent of pcl::MultiscaleFeaturePersistence (reference: features/
include/pcl/features/multiscale_feature_persistence.h — compute a feature
at several scales, build the mean descriptor per scale, and keep the points
whose descriptor deviates more than alpha * sigma from the mean at EVERY
scale; those are the "persistent", distinctive points used to drive
SAC-IA-style coarse alignment).
"""

from __future__ import annotations

from typing import Callable, Sequence, Tuple

import jax
import jax.numpy as jnp

_EPS = 1e-12


def feature_persistence(
    feature_fn: Callable[[float], jax.Array],
    scales: Sequence[float],
    mask: jax.Array,
    *,
    alpha: float = 1.0,
    distance: str = "l1",
) -> Tuple[jax.Array, jax.Array]:
    """Returns (persistent_mask [N] bool, distances [S, N]).

    ``feature_fn(scale)`` must return the [N, D] descriptor array at that
    scale (e.g. ``lambda r: estimate_fpfh(cloud, radius=r)``). A point is
    persistent when its distance to the scale-mean descriptor exceeds
    mean + alpha * stddev at every scale (reference
    determinePersistentFeatures: the intersection over scales).
    """
    w = mask.astype(jnp.float32)
    wsum = jnp.maximum(jnp.sum(w), 1.0)
    dists = []
    outlier_masks = []
    for s in scales:
        f = feature_fn(float(s))                        # [N, D]
        mu = jnp.sum(f * w[:, None], axis=0) / wsum
        if distance == "l1":
            d = jnp.sum(jnp.abs(f - mu), axis=-1)
        elif distance == "l2":
            d = jnp.linalg.norm(f - mu, axis=-1)
        elif distance == "chisq":
            d = jnp.sum((f - mu) ** 2 / jnp.maximum(f + mu, _EPS), axis=-1)
        else:
            raise ValueError(f"unknown distance {distance!r}")
        d_mu = jnp.sum(d * w) / wsum
        d_sd = jnp.sqrt(jnp.maximum(jnp.sum(w * (d - d_mu) ** 2) / wsum, 0.0))
        outlier_masks.append(mask & (d > d_mu + alpha * d_sd))
        dists.append(d)
    persistent = outlier_masks[0]
    for m in outlier_masks[1:]:
        persistent = persistent & m
    return persistent, jnp.stack(dists)
