"""Euclidean cluster extraction on three synthetic blobs
(reference: examples/segmentation/example_extract_clusters_normals.cpp)."""
import numpy as np
from pcl_tpu.core.cloud import from_numpy
from pcl_tpu.segmentation import euclidean_clusters

rng = np.random.default_rng(0)
blobs = [rng.normal(loc=c, scale=0.05, size=(150, 3)).astype(np.float32)
         for c in ([0, 0, 0], [1, 0, 0], [0, 1, 0])]
cloud = from_numpy(np.concatenate(blobs))
labels, n = euclidean_clusters(cloud, tolerance=0.2, min_cluster_size=10)
print("clusters found:", int(n))
for k in range(int(n)):
    print(f"  cluster {k}: {int((np.asarray(labels) == k).sum())} points")
