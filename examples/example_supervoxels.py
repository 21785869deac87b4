"""VCCS supervoxel clustering (reference:
examples/segmentation/example_supervoxels.cpp)."""
import numpy as np
from pcl_tpu.core.cloud import from_numpy
from pcl_tpu.segmentation import supervoxel_clustering

rng = np.random.default_rng(0)
pts = rng.uniform(0, 1, size=(2000, 3)).astype(np.float32)
rgb = (pts > 0.5).astype(np.float32)          # 8 color octants
cloud = from_numpy(pts, attrs={"rgb": rgb})
sv = supervoxel_clustering(cloud, seed_resolution=0.4)
n_sv = len(np.unique(np.asarray(sv.labels)[np.asarray(cloud.mask)]))
print("supervoxels:", n_sv)
