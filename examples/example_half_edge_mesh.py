"""Half-edge mesh construction and traversal
(reference: examples/geometry/example_half_edge_mesh.cpp)."""
import numpy as np
from pcl_tpu.geometry.halfedge import (
    build_halfedge_mesh, is_manifold, boundary_loops, vertex_one_ring)

verts = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float32)
tris = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
mesh = build_halfedge_mesh(verts, tris)
print("manifold:", is_manifold(mesh))
print("boundary loop sizes:", [len(l) for l in boundary_loops(mesh)])
print("vertex 0 one-ring:", sorted(vertex_one_ring(mesh, 0).tolist()))
