"""Ground-based people detection pipeline.

Re-design of pcl::people::GroundBasedPeopleDetectionApp (reference:
people/include/pcl/people/ground_based_people_detection_app.h:68): ground
plane removal (RANSAC plane or given coefficients), euclidean clustering
of the remainder, HEAD-BASED SUBCLUSTERING to split merged groups
(reference head_based_subcluster.h: local maxima of the height map along
the ground plane become person heads, points split by nearest head),
height/size gating, and the HOG+SVM confidence on the RGB projection
(people/classifier.py, weight-compatible with the reference's shipped
model). Returns per-cluster detections.
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


def head_based_subclusters(
    pts: np.ndarray,
    n: np.ndarray,
    d0: float,
    min_height: float = 1.3,
    max_height: float = 2.3,
    heads_min_distance: float = 0.3,
    bin_size: float = 0.06,
) -> List[np.ndarray]:
    """Split one euclidean cluster into per-person subclusters by height-map
    maxima (reference: people/include/pcl/people/head_based_subcluster.h +
    height_map_2d.h: people standing close merge into one cluster; their
    HEADS stay distinct as local maxima of height-above-ground binned over
    the ground plane).

    ``pts`` [N,3] cluster points, ``(n, d0)`` the ground plane (n·x + d0 =
    height). Returns a list of boolean masks over ``pts``.
    """
    h = pts @ n + d0
    # 2D ground-plane coordinates: two axes orthogonal to n
    a = np.array([1.0, 0.0, 0.0])
    if abs(n[0]) > 0.9:
        a = np.array([0.0, 1.0, 0.0])
    u = np.cross(n, a)
    u /= np.linalg.norm(u)
    v = np.cross(n, u)
    g = np.stack([pts @ u, pts @ v], axis=1)
    gmin = g.min(0)
    ij = np.floor((g - gmin) / bin_size).astype(np.int64)
    dims = ij.max(0) + 1
    lin = ij[:, 0] * dims[1] + ij[:, 1]
    hmap = np.zeros(dims[0] * dims[1], np.float32)
    np.maximum.at(hmap, lin, h.astype(np.float32))
    hmap = hmap.reshape(dims[0], dims[1])
    # local maxima above min_height, separated by heads_min_distance
    rad = max(1, int(round(heads_min_distance / bin_size)))
    pad = np.pad(hmap, rad, constant_values=0)
    windows = np.stack([
        pad[rad + dy:rad + dy + dims[0], rad + dx:rad + dx + dims[1]]
        for dy in range(-rad, rad + 1) for dx in range(-rad, rad + 1)
    ])
    is_max = (hmap >= windows.max(0)) & (hmap >= min_height) \
        & (hmap <= max_height + 0.5)
    heads = np.argwhere(is_max)
    if len(heads) <= 1:
        return [np.ones(len(pts), bool)]
    # suppress maxima closer than heads_min_distance (keep the taller)
    order = np.argsort(-hmap[heads[:, 0], heads[:, 1]])
    kept = []
    for hidx in order:
        c = heads[hidx]
        if all(np.linalg.norm((c - k) * bin_size) >= heads_min_distance
               for k in kept):
            kept.append(c)
    heads = np.asarray(kept)
    if len(heads) <= 1:
        return [np.ones(len(pts), bool)]
    # assign points to the nearest head in ground-plane coordinates
    head_g = heads * bin_size + gmin + 0.5 * bin_size
    d2 = ((g[:, None, :] - head_g[None, :, :]) ** 2).sum(-1)
    assign = np.argmin(d2, axis=1)
    return [assign == k for k in range(len(heads))]


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
        ground_coeffs: Optional[np.ndarray] = None,
        intrinsics: Optional[np.ndarray] = None,
        classifier=None,
        min_confidence: float = -1.5,
        subcluster: bool = True,
    ):
        self.voxel_size = voxel_size
        self.min_height = min_height
        self.max_height = max_height
        self.min_points = min_points
        self.cluster_tolerance = cluster_tolerance
        self.svm_model = svm_model
        self.ground_coeffs = ground_coeffs     # setGround analog
        self.intrinsics = intrinsics           # setIntrinsics (3x3 K)
        self.classifier = classifier           # PersonClassifier
        self.min_confidence = min_confidence
        self.subcluster = subcluster

    def detect(self, cloud: Cloud, key=None,
               rgb_image: Optional[np.ndarray] = None) -> List[PersonCandidate]:
        if key is None:
            key = jax.random.PRNGKey(0)
        # 1. ground plane: given coefficients (reference setGround) or RANSAC
        if self.ground_coeffs is not None:
            coeffs = np.asarray(self.ground_coeffs, np.float64)
            nn = np.linalg.norm(coeffs[:3])
            coeffs = coeffs / max(nn, 1e-12)
            xyz_all = np.asarray(cloud.xyz)
            d_all = xyz_all @ coeffs[:3] + coeffs[3]
            inliers = jnp.asarray(np.abs(d_all) < 0.05) & cloud.mask
            above = cloud.with_mask(cloud.mask & ~inliers)
        else:
            res = sac_segmentation(cloud, sac.PlaneModel(), 0.05, key=key)
            above = cloud.with_mask(~res.inliers)
            coeffs = np.asarray(res.coefficients, np.float64)
            coeffs = coeffs / max(np.linalg.norm(coeffs[:3]), 1e-12)
        n = coeffs[:3]
        # orient the normal so the scene's off-plane points sit at POSITIVE
        # height (works both when the camera is above the floor and when
        # the plane passes near the origin)
        xyz_all = np.asarray(cloud.xyz)
        off = xyz_all[np.asarray(above.mask)]
        if len(off) and np.median(off @ n + coeffs[3]) < 0:
            n = -n
            coeffs = -coeffs
        # 2. euclidean clustering of the remainder
        labels, _ = euclidean_clusters(
            above, self.cluster_tolerance, min_cluster_size=self.min_points)
        lab = np.asarray(labels)
        xyz = np.asarray(cloud.xyz)
        out: List[PersonCandidate] = []
        for l in sorted(set(lab[lab >= 0].tolist())):
            sel = lab == l
            pts = xyz[sel]
            # 3. head-based subclustering splits merged groups
            subs = head_based_subclusters(
                pts, n, coeffs[3], self.min_height, self.max_height) \
                if self.subcluster else [np.ones(len(pts), bool)]
            for sub in subs:
                spts = pts[sub]
                if len(spts) < self.min_points:
                    continue
                d = spts @ n + coeffs[3]
                height = float(d.max())
                if not (self.min_height <= height <= self.max_height):
                    continue
                score = 1.0
                if self.classifier is not None and rgb_image is not None \
                        and self.intrinsics is not None:
                    score = self._hog_confidence(spts, d, rgb_image, n)
                    if score < self.min_confidence:
                        continue
                elif self.svm_model is not None:
                    from pcl_tpu.ml import svm_classify
                    feat = jnp.asarray(self._cluster_features(spts)[None, :])
                    score = float(svm_classify(self.svm_model, feat)[0])
                    if score < 0:
                        continue
                out.append(PersonCandidate(
                    centroid=spts.mean(axis=0), height=height,
                    n_points=int(sub.sum()), score=score,
                ))
        return out

    def _hog_confidence(self, pts: np.ndarray, heights: np.ndarray,
                        rgb_image: np.ndarray, n: np.ndarray) -> float:
        """Project the cluster's top/bottom/center through the intrinsics
        and evaluate the HOG+SVM window (reference: PersonCluster's
        getTTop/getTBottom = the centroid displaced along the ground
        normal, ground_based_people_detection_app.hpp:403-409).

        ``n`` is the already-oriented unit ground normal from detect() —
        re-deriving it here from self.ground_coeffs both crashed when the
        plane came from RANSAC (ground_coeffs is None) and could disagree
        with detect()'s median-height orientation rule.
        """
        K = np.asarray(self.intrinsics, np.float64)
        n = np.asarray(n, np.float64)
        center = pts.mean(0)
        h_c = float(heights.mean())
        ttop = center + (float(heights.max()) - h_c) * n
        tbottom = center - h_c * n
        p_top = K @ ttop
        p_top /= p_top[2]
        p_bot = K @ tbottom
        p_bot /= p_bot[2]
        p_c = K @ center
        p_c /= p_c[2]
        pixel_height = p_bot[1] - p_top[1]
        return self.classifier.evaluate(
            rgb_image, float(p_c[0]), float(p_c[1]), float(pixel_height))

    @staticmethod
    def _cluster_features(pts: np.ndarray) -> np.ndarray:
        """Simple geometric feature vector for the optional SVM stage."""
        mu = pts.mean(0)
        d = pts - mu
        cov = d.T @ d / max(len(pts), 1)
        lam = np.sort(np.linalg.eigvalsh(cov))[::-1]
        ext = pts.max(0) - pts.min(0)
        return np.concatenate([lam, ext, [len(pts)]]).astype(np.float32)
