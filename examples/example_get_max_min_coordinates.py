"""Masked bounding box of a cloud (reference:
examples/common/example_get_max_min_coordinates.cpp)."""
import numpy as np
import jax.numpy as jnp
from pcl_tpu.core.cloud import from_numpy

pts = np.random.default_rng(0).uniform(-2, 3, size=(500, 3)).astype(np.float32)
c = from_numpy(pts)
w = c.mask[:, None]
mn = jnp.min(jnp.where(w, c.xyz, jnp.inf), axis=0)
mx = jnp.max(jnp.where(w, c.xyz, -jnp.inf), axis=0)
print("min:", np.asarray(mn), "max:", np.asarray(mx))
