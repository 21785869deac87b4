"""Euclidean clustering of two separated objects (reference:
examples/segmentation/example_extract_clusters_normals.cpp)."""
import numpy as np
from pcl_tpu.core.cloud import from_numpy
from pcl_tpu.segmentation import euclidean_clusters, labels_to_cluster_sizes

rng = np.random.default_rng(0)
a = rng.normal(scale=0.2, size=(500, 3)).astype(np.float32)
b = rng.normal(scale=0.2, size=(500, 3)).astype(np.float32) + [3, 0, 0]
cloud = from_numpy(np.vstack([a, b]))
labels, n_clusters = euclidean_clusters(cloud, tolerance=0.5,
                                        min_cluster_size=50)
sizes = np.asarray(labels_to_cluster_sizes(labels))
print("clusters:", int((sizes >= 50).sum()))
assert int((sizes >= 50).sum()) == 2
