"""Octree voxel/radius search (reference: examples/common + octree tutorial)."""
import numpy as np
import jax.numpy as jnp
from pcl_tpu.octree import linear
from pcl_tpu.search import cell_list

rng = np.random.default_rng(0)
pts = rng.uniform(0, 1, size=(5000, 3)).astype(np.float32)
tree = linear.build(jnp.asarray(pts), jnp.ones(5000, bool), 0.05)
print("occupied leaves:", int(tree.leaf_count))
tab = cell_list.build(jnp.asarray(pts), jnp.ones(5000, bool), 0.1)
idx, d2, valid, count, _ = cell_list.radius_search(
    tab, jnp.asarray(pts[:5]), 0.1, cap_out=32)
print("neighbors within 0.1 of first 5 points:", np.asarray(count))
