"""SAC segmentation + cloud differencing.

- sac_segmentation: pcl::SACSegmentation(+FromNormals) equivalent
  (reference: segmentation/include/pcl/segmentation/sac_segmentation.h:64,
  305) — robust model fit returning inliers + coefficients, for plane
  extraction pipelines (the `tools/sac_segmentation*` CLIs).
- segment_differences: pcl::SegmentDifferences (reference:
  segmentation/include/pcl/segmentation/segment_differences.h) — points of A
  farther than a threshold from every point of B.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from pcl_tpu.core.cloud import Cloud, ATTR_NORMAL
from pcl_tpu.sac import ransac, SacResult
from pcl_tpu.sac.models import SacModel
from pcl_tpu.search import bruteforce


def sac_segmentation(
    cloud: Cloud,
    model: SacModel,
    distance_threshold: float,
    *,
    key: Optional[jax.Array] = None,
    n_hypotheses: int = 1024,
    method: str = "ransac",
    refine: bool = True,
) -> SacResult:
    """Fit a geometric model to the cloud; result.inliers is the segment."""
    normals = cloud.attrs.get(ATTR_NORMAL) if model.needs_normals else None
    if model.needs_normals and normals is None:
        raise ValueError(f"{type(model).__name__} requires normals on the cloud")
    return ransac(
        model, cloud.xyz, cloud.mask, distance_threshold,
        key=key, n_hypotheses=n_hypotheses, method=method, refine=refine,
        normals=normals,
    )


@jax.jit
def segment_differences(
    a: Cloud,
    b: Cloud,
    distance_threshold: float,
) -> Cloud:
    """Points of ``a`` with no ``b`` point within the threshold."""
    _idx, d2 = bruteforce.nn1(b.xyz, b.mask, a.xyz)
    far = d2 > jnp.float32(distance_threshold) ** 2
    return a.with_mask(far)
