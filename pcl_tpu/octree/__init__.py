"""Octree — linear (morton-order) octree over fixed-depth voxel keys.

TPU-native re-design of the reference ``octree/`` module (SURVEY §2.3):
pointer-based `OctreeBase` nodes (reference: octree/include/pcl/octree/
octree_base.h:62) become a SORTED ARRAY of bit-interleaved voxel keys
(the reference's own `OctreeKey` idea, octree_key.h, taken to its
array-programming conclusion — like the GPU octree's morton builder,
gpu/octree/src/cuda/octree_builder.cu). Every octree operation is then a
sort/searchsorted/segment reduction:

- leaf iteration     = unique keys (+ segment stats)
- occupancy query    = binary search
- change detection   = sorted set difference (Octree2BufBase equivalent)
- level-k traversal  = right-shift keys by 3(depth-k) + unique
- box/radius search  = key-range / cell-list queries
"""

from pcl_tpu.octree.linear import (
    LinearOctree,
    build,
    morton_encode,
    morton_decode,
    voxel_search,
    is_voxel_occupied,
    leaf_centroids,
    change_detection,
    box_search,
    at_depth,
)
from pcl_tpu.octree.ray import ray_intersected_voxels, approx_nearest_search
from pcl_tpu.octree.iterators import (
    OctreeNode,
    leaf_iterator,
    depth_first_iterator,
    breadth_first_iterator,
    fixed_depth_iterator,
    leaf_breadth_first_iterator,
    node_counts_per_depth,
)
from pcl_tpu.octree.containers import (
    adjacency,
    OccupancyGrid,
    occupancy_from_tree,
    is_occupied,
    set_occupied,
)
