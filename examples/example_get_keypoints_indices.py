"""Keypoint detection returning indices into the original cloud
(reference: examples/keypoints/example_get_keypoints_indices.cpp)."""
import numpy as np
from pcl_tpu.core.cloud import from_numpy
from pcl_tpu import features
from pcl_tpu.keypoints import harris3d_keypoints

rng = np.random.default_rng(0)
pts = rng.uniform(-1, 1, size=(1500, 3)).astype(np.float32)
pts[:, 2] *= 0.1
cloud = features.estimate_normals(from_numpy(pts), k=12)
kp_mask, response = harris3d_keypoints(cloud, radius=0.3)
indices = np.nonzero(np.asarray(kp_mask))[0]
print("harris keypoints:", len(indices), "first indices:", indices[:5])
