"""RANSAC plane fit on a noisy plane + outliers
(reference: examples/segmentation pipelines)."""
import numpy as np
from pcl_tpu.core.cloud import from_numpy
from pcl_tpu import sac, segmentation

rng = np.random.default_rng(0)
xy = rng.uniform(-1, 1, size=(800, 2)).astype(np.float32)
plane = np.concatenate([xy, 0.02 * rng.normal(size=(800, 1)).astype(np.float32)], 1)
noise = rng.uniform(-1, 1, size=(200, 3)).astype(np.float32)
cloud = from_numpy(np.concatenate([plane, noise]))
res = segmentation.sac_segmentation(cloud, sac.PlaneModel(), 0.05)
print("inliers:", int(res.num_inliers), "/ 1000")
print("plane coefficients:", np.round(np.asarray(res.coefficients), 3))
