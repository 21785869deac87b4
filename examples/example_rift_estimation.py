"""RIFT descriptors from intensity gradients (reference:
examples/features/example_rift_estimation.cpp)."""
import numpy as np
from pcl_tpu.core.cloud import from_numpy
from pcl_tpu import features

rng = np.random.default_rng(0)
pts = rng.uniform(-1, 1, size=(800, 3)).astype(np.float32)
intensity = (0.5 + 0.5 * np.sin(3 * pts[:, 0])).astype(np.float32)
cloud = features.estimate_normals(
    from_numpy(pts, attrs={"intensity": intensity}), k=12)
grads = features.intensity_gradient(cloud, radius=0.4, k=16)
rift = np.asarray(features.rift(cloud, 0.4, grads, k=16))
print("RIFT:", rift.shape)
assert rift.shape[1] == 32  # 4 distance x 8 gradient bins
