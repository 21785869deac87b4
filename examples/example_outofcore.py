"""Out-of-core octree: build on disk, query back
(reference: examples/outofcore/example_outofcore.cpp)."""
import tempfile
import numpy as np
from pcl_tpu.core.cloud import from_numpy
from pcl_tpu.outofcore import OutofcoreOctree

rng = np.random.default_rng(0)
pts = rng.uniform(0, 10, size=(20000, 3)).astype(np.float32)
with tempfile.TemporaryDirectory() as d:
    oc = OutofcoreOctree.create(d, cell_size=1.0, split_depth=4)
    oc.add_cloud(from_numpy(pts))
    sub = oc.query_box(np.float32([2, 2, 2]), np.float32([5, 5, 5]))
    print("points in box [2,5]^3:", int(sub.count))
    full = oc.query_box(np.float32([0, 0, 0]), np.float32([10, 10, 10]), lod=0)
    print("LOD0 sample size:", int(full.count))
