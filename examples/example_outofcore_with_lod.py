"""Out-of-core octree with level-of-detail reads (reference:
examples/outofcore/example_outofcore_with_lod.cpp)."""
import os
import tempfile
import numpy as np
from pcl_tpu.core.cloud import from_numpy
from pcl_tpu.outofcore import OutofcoreOctree

rng = np.random.default_rng(0)
root = os.path.join(tempfile.mkdtemp(), "tree")
tree = OutofcoreOctree.create(root, cell_size=0.5, origin=(-1, -1, -1))
tree.add_cloud(from_numpy(rng.uniform(-1, 1, (5000, 3)).astype(np.float32)))
full = tree.query_box((-1, -1, -1), (1, 1, 1))
coarse = tree.query_box((-1, -1, -1), (1, 1, 1), lod=1)
print("full:", int(full.count), "lod1:", int(coarse.count))
