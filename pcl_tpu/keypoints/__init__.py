"""Keypoint detection — TPU-native equivalents of the reference
``keypoints/`` module (SURVEY §2.10): batched saliency + vectorized
non-maximum suppression instead of per-point loops.
"""

from pcl_tpu.keypoints.iss import iss3d_keypoints
from pcl_tpu.keypoints.harris import harris3d_keypoints
from pcl_tpu.keypoints.sift import sift_keypoints
from pcl_tpu.keypoints.susan import susan_keypoints
from pcl_tpu.keypoints.corners2d import (
    agast_keypoints,
    brisk_keypoints,
    brisk_descriptor,
    trajkovic_keypoints,
    agast_score,
    trajkovic_score,
)
from pcl_tpu.keypoints.smoothed import smoothed_surfaces_keypoints
