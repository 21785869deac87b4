"""Half-edge mesh tests (mirrors reference test/geometry/test_mesh.cpp
style: build small meshes, walk circulators, check invariants)."""

import numpy as np
import pytest

from pcl_tpu.geometry import (
    build_halfedge_mesh, vertex_one_ring, vertex_face_ring, face_adjacency,
    boundary_half_edges, boundary_loops, euler_characteristic, is_manifold,
    to_face_vertex,
)


def square_grid(n=3):
    """(n+1)^2 vertices, 2n^2 triangles."""
    vs = np.array([[x, y, 0.0] for y in range(n + 1) for x in range(n + 1)],
                  np.float32)
    faces = []
    for y in range(n):
        for x in range(n):
            a = y * (n + 1) + x
            b = a + 1
            c = a + (n + 1)
            d = c + 1
            faces.append([a, b, d])
            faces.append([a, d, c])
    return vs, np.asarray(faces, np.int32)


def tetrahedron():
    vs = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32)
    faces = [[0, 2, 1], [0, 1, 3], [1, 2, 3], [0, 3, 2]]
    return vs, faces


class TestBuild:
    def test_counts_grid(self):
        vs, fs = square_grid(3)
        m = build_halfedge_mesh(vs, fs)
        assert m.n_vertices == 16
        assert m.n_faces == 18
        # E = 3F/2 interior shared + boundary: for this grid E = 33
        assert m.n_edges == 33
        assert euler_characteristic(m) == 1      # disk topology

    def test_closed_tetrahedron(self):
        vs, fs = tetrahedron()
        m = build_halfedge_mesh(vs, fs)
        assert m.n_edges == 6
        assert euler_characteristic(m) == 2      # sphere topology
        assert len(boundary_half_edges(m)) == 0
        assert is_manifold(m)

    def test_rejects_inconsistent_winding(self):
        vs = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0]], np.float32)
        with pytest.raises(ValueError):
            # second face repeats directed edge (0,1)
            build_halfedge_mesh(vs, [[0, 1, 2], [0, 1, 3]])

    def test_polygon_faces(self):
        vs = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
                       [2, 0, 0], [2, 1, 0]], np.float32)
        m = build_halfedge_mesh(vs, [[0, 1, 2, 3], [1, 4, 5, 2]])
        assert m.n_faces == 2
        adj = face_adjacency(m)
        assert 1 in adj[0]
        assert 0 in adj[1]


class TestCirculators:
    def test_interior_vertex_ring(self):
        vs, fs = square_grid(2)
        m = build_halfedge_mesh(vs, fs)
        center = 4                                # middle of a 3x3 grid
        ring = vertex_one_ring(m, center)
        assert sorted(ring.tolist()) == [1, 3, 5, 7] or len(ring) == 6
        fring = vertex_face_ring(m, center)
        assert len(fring) == len(set(fring.tolist()))
        assert len(fring) == 6

    def test_boundary_loop(self):
        vs, fs = square_grid(2)
        m = build_halfedge_mesh(vs, fs)
        loops = boundary_loops(m)
        assert len(loops) == 1
        assert len(loops[0]) == 8                 # grid perimeter vertices

    def test_closed_mesh_rings(self):
        vs, fs = tetrahedron()
        m = build_halfedge_mesh(vs, fs)
        for v in range(4):
            assert sorted(vertex_one_ring(m, v).tolist()) == sorted(
                set(range(4)) - {v})
            assert len(vertex_face_ring(m, v)) == 3


class TestConversions:
    def test_roundtrip(self):
        vs, fs = square_grid(2)
        m = build_halfedge_mesh(vs, fs)
        v2, f2 = to_face_vertex(m)
        np.testing.assert_array_equal(v2, vs)
        np.testing.assert_array_equal(f2, fs)
