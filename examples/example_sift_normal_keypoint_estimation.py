"""SIFT keypoints on the NORMAL-curvature field (reference:
examples/keypoints/example_sift_normal_keypoint_estimation.cpp — scale
space built on curvature instead of intensity)."""
import numpy as np
import jax.numpy as jnp
from pcl_tpu.core.cloud import from_numpy
from pcl_tpu import features
from pcl_tpu.keypoints import sift_keypoints

rng = np.random.default_rng(0)
xy = rng.uniform(-1, 1, size=(2000, 2)).astype(np.float32)
z = 0.4 * np.exp(-8 * (xy ** 2).sum(1))
cloud = features.estimate_normals(
    from_numpy(np.column_stack([xy, z]).astype(np.float32)), k=12)
curv = cloud.attrs["curvature"] if "curvature" in cloud.attrs else None
kp_mask, scale = sift_keypoints(cloud, min_scale=0.05, n_octaves=3,
                                min_contrast=1e-4, field=curv)
print("SIFT (curvature field) keypoints:", int(np.asarray(kp_mask).sum()))
