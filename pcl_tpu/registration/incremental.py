"""Incremental / meta registration — running scan-to-scan odometry.

Equivalents of pcl::registration::IncrementalRegistration (reference:
registration/include/pcl/registration/incremental_registration.h:75) and
MetaRegistration (meta_registration.h:78). Host-side accumulators around the
jitted pairwise aligners: incremental aligns each new scan to the PREVIOUS
scan and chains transforms; meta aligns to a growing model cloud.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from pcl_tpu.core.cloud import Cloud, concat
from pcl_tpu.core.transforms import transform_cloud
from pcl_tpu.registration.icp import icp


class IncrementalRegistration:
    """Chain pairwise alignments: abs_pose_k = abs_pose_{k-1} @ T(k, k-1)."""

    def __init__(self, register: Optional[Callable] = None, **icp_kwargs):
        self._register = register or (lambda s, t: icp(s, t, **icp_kwargs))
        self._last: Optional[Cloud] = None
        self._abs = jnp.eye(4, dtype=jnp.float32)

    def register_cloud(self, cloud: Cloud, delta_estimate: Optional[jax.Array] = None) -> bool:
        """Feed the next scan; returns False if the pairwise step failed."""
        if self._last is None:
            self._last = cloud
            return True
        res = self._register(cloud, self._last)
        ok = bool(res.converged)
        if ok:
            self._abs = self._abs @ res.transform
            self._last = cloud
        return ok

    @property
    def absolute_transform(self) -> jax.Array:
        """Pose of the last registered scan in the first scan's frame."""
        return self._abs

    def reset(self):
        self._last = None
        self._abs = jnp.eye(4, dtype=jnp.float32)


class MetaRegistration:
    """Align each scan against the union of all previously aligned scans."""

    def __init__(self, register: Optional[Callable] = None,
                 max_model_points: int = 1 << 20, **icp_kwargs):
        self._register = register or (lambda s, t: icp(s, t, **icp_kwargs))
        self._model: Optional[Cloud] = None
        self._abs = jnp.eye(4, dtype=jnp.float32)
        self._max_model_points = max_model_points

    def register_cloud(self, cloud: Cloud) -> bool:
        if self._model is None:
            self._model = cloud
            return True
        res = self._register(cloud, self._model)
        ok = bool(res.converged)
        if ok:
            self._abs = res.transform
            aligned = transform_cloud(res.transform, cloud)
            merged = concat(self._model, aligned)
            if merged.capacity <= self._max_model_points:
                self._model = merged
        return ok

    @property
    def model(self) -> Optional[Cloud]:
        return self._model

    @property
    def absolute_transform(self) -> jax.Array:
        return self._abs
