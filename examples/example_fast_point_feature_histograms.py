"""FPFH descriptors on a curved surface (reference:
examples/features/example_fast_point_feature_histograms.cpp)."""
import numpy as np
from pcl_tpu.core.cloud import from_numpy
from pcl_tpu import features

rng = np.random.default_rng(0)
xy = rng.uniform(-1, 1, size=(800, 2)).astype(np.float32)
z = 0.3 * np.sin(2 * xy[:, 0]) * np.cos(2 * xy[:, 1])
cloud = features.estimate_normals(from_numpy(np.column_stack([xy, z])), k=12)
fpfh = np.asarray(features.estimate_fpfh(cloud, k=12))
print("FPFH:", fpfh.shape, "row sums ~100:", float(fpfh[0].sum()))
assert fpfh.shape[1] == 33
