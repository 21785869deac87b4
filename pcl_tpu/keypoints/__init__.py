"""Keypoint detection — TPU-native equivalents of the reference
``keypoints/`` module (SURVEY §2.10): batched saliency + vectorized
non-maximum suppression instead of per-point loops.
"""

from pcl_tpu.keypoints.iss import iss3d_keypoints
from pcl_tpu.keypoints.harris import harris3d_keypoints
from pcl_tpu.keypoints.sift import sift_keypoints
from pcl_tpu.keypoints.susan import susan_keypoints
