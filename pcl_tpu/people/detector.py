"""Ground-based people detection pipeline.

Re-design of pcl::people::GroundBasedPeopleDetectionApp (reference:
people/include/pcl/people/ground_based_people_detection_app.h:68): ground
plane removal (RANSAC plane), euclidean clustering of the remainder,
height/size gating of candidate clusters, and an optional HOG+SVM score on
the cluster's depth-image projection. Returns per-cluster detections.
"""

from __future__ import annotations

from typing import List, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from pcl_tpu.core.cloud import Cloud
from pcl_tpu import sac
from pcl_tpu.segmentation import euclidean_clusters, sac_segmentation


class PersonCandidate(NamedTuple):
    centroid: np.ndarray
    height: float
    n_points: int
    score: float


class GroundBasedPeopleDetector:
    """setX/compute style host orchestrator over jitted stages."""

    def __init__(
        self,
        voxel_size: float = 0.06,
        min_height: float = 1.3,
        max_height: float = 2.3,
        min_points: int = 30,
        cluster_tolerance: float = 0.2,
        svm_model=None,
    ):
        self.voxel_size = voxel_size
        self.min_height = min_height
        self.max_height = max_height
        self.min_points = min_points
        self.cluster_tolerance = cluster_tolerance
        self.svm_model = svm_model

    def detect(self, cloud: Cloud, key=None) -> List[PersonCandidate]:
        if key is None:
            key = jax.random.PRNGKey(0)
        # 1. dominant ground plane
        res = sac_segmentation(cloud, sac.PlaneModel(), 0.05, key=key)
        above = cloud.with_mask(~res.inliers)
        coeffs = np.asarray(res.coefficients)
        n = coeffs[:3]
        if n[2] < 0:   # normal up
            n = -n
            coeffs = -coeffs
        # 2. cluster the remainder
        labels, _ = euclidean_clusters(
            above, self.cluster_tolerance, min_cluster_size=self.min_points)
        lab = np.asarray(labels)
        xyz = np.asarray(cloud.xyz)
        out: List[PersonCandidate] = []
        for l in sorted(set(lab[lab >= 0].tolist())):
            sel = lab == l
            pts = xyz[sel]
            # height above the plane
            d = pts @ n + coeffs[3]
            height = float(d.max())
            if not (self.min_height <= height <= self.max_height):
                continue
            score = 1.0
            if self.svm_model is not None:
                from pcl_tpu.ml import svm_classify
                feat = jnp.asarray(self._cluster_features(pts)[None, :])
                score = float(svm_classify(self.svm_model, feat)[0])
                if score < 0:
                    continue
            out.append(PersonCandidate(
                centroid=pts.mean(axis=0), height=height,
                n_points=int(sel.sum()), score=score,
            ))
        return out

    @staticmethod
    def _cluster_features(pts: np.ndarray) -> np.ndarray:
        """Simple geometric feature vector for the optional SVM stage."""
        mu = pts.mean(0)
        d = pts - mu
        cov = d.T @ d / max(len(pts), 1)
        lam = np.sort(np.linalg.eigvalsh(cov))[::-1]
        ext = pts.max(0) - pts.min(0)
        return np.concatenate([lam, ext, [len(pts)]]).astype(np.float32)
