"""Region growing on two smooth surfaces meeting at a crease (reference:
examples/segmentation/example_region_growing.cpp)."""
import numpy as np
from pcl_tpu.core.cloud import from_numpy
from pcl_tpu import features
from pcl_tpu.segmentation import region_growing, labels_to_cluster_sizes

rng = np.random.default_rng(0)
xy = rng.uniform(0, 1, size=(1200, 2)).astype(np.float32)
flat = np.column_stack([xy, np.zeros(1200)])
wall = np.column_stack([xy[:600, 0], np.ones(600), xy[:600, 1]])
cloud = features.estimate_normals(
    from_numpy(np.vstack([flat, wall]).astype(np.float32)), k=16)
labels, n_clusters = region_growing(cloud, smoothness_threshold=0.3, k=16)
sizes = np.asarray(labels_to_cluster_sizes(labels))
big = int((sizes > 100).sum())
print("regions >100 pts:", big)
