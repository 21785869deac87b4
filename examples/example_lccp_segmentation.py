"""LCCP: merge supervoxels across convex connections (reference:
examples/segmentation/example_lccp_segmentation.cpp)."""
import numpy as np
from pcl_tpu.core.cloud import from_numpy
from pcl_tpu import features
from pcl_tpu.segmentation import supervoxel_clustering, lccp_segmentation

rng = np.random.default_rng(0)
xy = rng.uniform(-1, 1, size=(1500, 2)).astype(np.float32)
z = np.abs(xy[:, 0])                          # concave valley at x=0
cloud = features.estimate_normals(
    from_numpy(np.column_stack([xy, z]).astype(np.float32)), k=12)
sv = supervoxel_clustering(cloud, seed_resolution=0.4)
point_labels, sv_segment = lccp_segmentation(sv, concavity_tolerance=0.2)
n_seg = len(np.unique(np.asarray(point_labels)[np.asarray(cloud.mask)]))
print("lccp segments:", n_seg)
