"""Estimate surface normals on a plane and verify they point up
(reference: examples/features/example_normal_estimation.cpp)."""
import numpy as np
from pcl_tpu.core.cloud import from_numpy
from pcl_tpu import features

rng = np.random.default_rng(0)
xy = rng.uniform(-1, 1, size=(1000, 2)).astype(np.float32)
pts = np.concatenate([xy, np.zeros((1000, 1), np.float32)], axis=1)
cloud = features.estimate_normals(from_numpy(pts), k=12,
                                  viewpoint=np.float32([0, 0, 10]))
n = np.asarray(cloud.attrs["normal"])
print("mean |nz|:", float(np.abs(n[:, 2]).mean()), "(expect ~1.0)")
