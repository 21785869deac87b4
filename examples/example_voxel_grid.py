"""Downsample with a voxel grid (reference: examples/filters)."""
import numpy as np
from pcl_tpu.core.cloud import from_numpy
from pcl_tpu import filters

rng = np.random.default_rng(0)
cloud = from_numpy(rng.uniform(0, 1, size=(20000, 3)).astype(np.float32))
down = filters.voxel_downsample(cloud, leaf_size=0.1)
print(f"{int(cloud.count)} points -> {int(down.count)} voxel centroids")
