"""NaN removal is implicit in from_numpy; compaction via take (reference:
examples/filters/example_remove_nan_from_point_cloud.cpp)."""
import numpy as np
import jax.numpy as jnp
from pcl_tpu.core.cloud import from_numpy, to_numpy

pts = np.random.default_rng(0).normal(size=(50, 3)).astype(np.float32)
pts[::5] = np.nan
cloud = from_numpy(pts)
xyz, _ = to_numpy(cloud, compact=True)
print("kept", len(xyz), "of", len(pts))
assert len(xyz) == 40
