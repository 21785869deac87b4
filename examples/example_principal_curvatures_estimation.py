"""Principal curvatures on a cylinder: k1 ~ 1/r along the bend, k2 ~ 0
(reference: examples/features/example_principal_curvatures_estimation.cpp)."""
import numpy as np
from pcl_tpu.core.cloud import from_numpy
from pcl_tpu import features

rng = np.random.default_rng(0)
theta = rng.uniform(0, np.pi, 2000)
y = rng.uniform(-1, 1, 2000)
r = 0.5
pts = np.column_stack([r * np.cos(theta), y, r * np.sin(theta)]).astype(np.float32)
cloud = features.estimate_normals(from_numpy(pts), k=16)
pc1, pc2, dirs = features.principal_curvatures(cloud, k=16)
print("median k1:", float(np.median(np.asarray(pc1))), "(expect ~%.1f)" % (1 / r),
      "median k2:", float(np.median(np.asarray(pc2))))
