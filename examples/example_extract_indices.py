"""Plane segmentation + index extraction (reference:
examples/filters/example_extract_indices.cpp pattern via SAC plane)."""
import numpy as np
import jax.numpy as jnp
from pcl_tpu.core.cloud import from_numpy
from pcl_tpu import sac
from pcl_tpu.segmentation import sac_segmentation
from pcl_tpu.filters import extract_indices

rng = np.random.default_rng(0)
plane = np.column_stack([rng.uniform(-1, 1, (400, 2)), np.zeros(400)])
noise = rng.uniform(-1, 1, (100, 3))
cloud = from_numpy(np.vstack([plane, noise]).astype(np.float32))
res = sac_segmentation(cloud, sac.PlaneModel(), distance_threshold=0.02)
inl = jnp.nonzero(res.inliers, size=cloud.capacity, fill_value=0)[0]
plane_cloud = extract_indices(cloud, inl[: int(res.inliers.sum())])
rest = cloud.with_mask(cloud.mask & ~res.inliers)
print("plane:", int(res.inliers.sum()), "rest:", int(rest.count))
