"""Difference of normals: large on edges, small on flats (reference:
examples/features/example_difference_of_normals.cpp)."""
import numpy as np
from pcl_tpu.core.cloud import from_numpy
from pcl_tpu import features

rng = np.random.default_rng(0)
xy = rng.uniform(-1, 1, size=(1500, 2)).astype(np.float32)
z = np.where(xy[:, 0] > 0, 0.5 * xy[:, 0], 0.0)   # crease at x=0
cloud = from_numpy(np.column_stack([xy, z]).astype(np.float32))
don = np.asarray(features.difference_of_normals(cloud, k_small=6, k_large=24))
near_edge = np.abs(xy[:, 0]) < 0.1
print("DoN near crease:", float(don[near_edge].mean()),
      "on flats:", float(don[~near_edge].mean()))
