"""Transformation validation — accept/reject an estimated transform.

Equivalent of pcl::registration::TransformationValidationEuclidean
(reference: registration/include/pcl/registration/
transformation_validation_euclidean.h — validateTransformation returns the
mean (optionally truncated) squared NN distance of the transformed source
to the target; callers threshold it).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from pcl_tpu.core.cloud import Cloud
from pcl_tpu.core.transforms import transform_points
from pcl_tpu.registration import correspondence as corr_mod


class ValidationResult(NamedTuple):
    score: jax.Array      # f32 mean squared NN distance (lower = better)
    is_valid: jax.Array   # bool score <= threshold
    num_inliers: jax.Array


@partial(jax.jit, static_argnames=("max_range",))
def validate_euclidean(
    source: Cloud,
    target: Cloud,
    transform: jax.Array,
    *,
    max_range: float = jnp.inf,
    threshold: float = jnp.inf,
) -> ValidationResult:
    """Score ``transform`` by truncated mean squared NN distance and compare
    against ``threshold`` (TransformationValidationEuclidean semantics)."""
    src_t = transform_points(transform, source.xyz)
    c = corr_mod.determine_correspondences(
        src_t, source.mask, target.xyz, target.mask, max_range)
    w = c.valid.astype(jnp.float32)
    score = jnp.sum(w * c.sqdist) / jnp.maximum(jnp.sum(w), 1.0)
    return ValidationResult(
        score=score,
        is_valid=score <= threshold,
        num_inliers=jnp.sum(c.valid.astype(jnp.int32)),
    )
