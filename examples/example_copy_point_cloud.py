"""Copy a cloud / a subset of it (reference:
examples/common/example_copy_point_cloud.cpp)."""
import numpy as np
import jax.numpy as jnp
from pcl_tpu.core.cloud import from_numpy
from pcl_tpu.filters import extract_indices

cloud = from_numpy(np.random.default_rng(0).normal(size=(100, 3)).astype(np.float32))
subset = extract_indices(cloud, jnp.arange(10))
print("copied subset:", int(subset.count), "points")
assert int(subset.count) == 10
