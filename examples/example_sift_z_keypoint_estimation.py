"""SIFT keypoints on the z field (reference:
examples/keypoints/example_sift_z_keypoint_estimation.cpp)."""
import numpy as np
import jax.numpy as jnp
from pcl_tpu.core.cloud import from_numpy
from pcl_tpu.keypoints import sift_keypoints

rng = np.random.default_rng(0)
xy = rng.uniform(-1, 1, size=(2000, 2)).astype(np.float32)
z = 0.4 * np.exp(-8 * (xy ** 2).sum(1))
cloud = from_numpy(np.column_stack([xy, z]).astype(np.float32))
kp_mask, scale = sift_keypoints(cloud, min_scale=0.05, n_octaves=3,
                                min_contrast=1e-4,
                                field=cloud.xyz[:, 2])
print("SIFT (z field) keypoints:", int(np.asarray(kp_mask).sum()))
