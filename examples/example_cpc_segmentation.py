"""CPC: constrained plane cuts on supervoxel adjacency (reference:
examples/segmentation/example_cpc_segmentation.cpp)."""
import numpy as np
from pcl_tpu.core.cloud import from_numpy
from pcl_tpu import features
from pcl_tpu.segmentation import supervoxel_clustering, cpc_segmentation

rng = np.random.default_rng(0)
a = rng.uniform(-1, 1, size=(800, 2)).astype(np.float32)
# two parallel slabs joined weakly
slab1 = np.column_stack([a[:, 0], a[:, 1], np.zeros(800)])
slab2 = np.column_stack([a[:, 0], a[:, 1], 0.6 + np.zeros(800)])
cloud = features.estimate_normals(
    from_numpy(np.vstack([slab1, slab2]).astype(np.float32)), k=10)
sv = supervoxel_clustering(cloud, seed_resolution=0.5)
labels = cpc_segmentation(cloud, sv)
print("cpc parts:", len(np.unique(labels[labels >= 0])))
