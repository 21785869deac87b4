"""3D shape context descriptors (reference:
examples/features/example_shape_contexts.cpp)."""
import numpy as np
from pcl_tpu.core.cloud import from_numpy
from pcl_tpu import features

rng = np.random.default_rng(0)
pts = rng.normal(size=(600, 3)).astype(np.float32)
cloud = features.estimate_normals(from_numpy(pts), k=12)
sc = np.asarray(features.estimate_3dsc(cloud, radius=1.0, k=32))
print("3DSC:", sc.shape)
