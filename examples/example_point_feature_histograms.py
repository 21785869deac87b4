"""PFH descriptors (reference:
examples/features/example_point_feature_histograms.cpp)."""
import numpy as np
from pcl_tpu.core.cloud import from_numpy
from pcl_tpu import features

rng = np.random.default_rng(0)
xy = rng.uniform(-1, 1, size=(500, 2)).astype(np.float32)
z = 0.2 * (xy[:, 0] ** 2 - xy[:, 1] ** 2)
cloud = features.estimate_normals(from_numpy(np.column_stack([xy, z])), k=10)
pfh = np.asarray(features.estimate_pfh(cloud, k=10))
print("PFH:", pfh.shape)
assert pfh.shape[1] == 125
