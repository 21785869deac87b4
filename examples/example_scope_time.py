"""RAII wall-clock timing (reference: examples/common/example_scope_time.cpp,
pcl::ScopeTime at common/include/pcl/common/time.h:105)."""
import numpy as np
from pcl_tpu.utils import ScopeTime
from pcl_tpu.core.cloud import from_numpy
from pcl_tpu.filters import voxel_downsample

cloud = from_numpy(np.random.default_rng(0).normal(size=(20000, 3)).astype(np.float32))
with ScopeTime("voxel_downsample"):
    out = voxel_downsample(cloud, 0.1)
print("voxels:", int(out.count))
