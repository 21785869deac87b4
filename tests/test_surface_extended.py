"""Surface tests — Poisson, GP3 triangulation, ear clipping, grid
projection, surfel smoothing, bilateral upsampling, texture mapping."""

import numpy as np
import jax.numpy as jnp

from pcl_tpu.core.cloud import make_cloud, ATTR_NORMAL
from pcl_tpu import features
from pcl_tpu.surface import (
    poisson_reconstruction,
    greedy_projection_triangulation,
    ear_clipping,
    triangulate_mesh_polygons,
    grid_projection,
    surfel_smoothing,
    bilateral_upsampling,
    texture_mapping,
)


def _sphere_cloud(rng, n=2000):
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    c = make_cloud(jnp.asarray(d))
    c = features.estimate_normals(c, k=12, viewpoint=jnp.zeros(3))
    return c.with_attrs(normal=-c.attrs[ATTR_NORMAL])  # outward


class TestPoisson:
    def test_sphere(self, rng):
        c = _sphere_cloud(rng)
        verts, tris = poisson_reconstruction(c, depth=5)
        assert len(verts) > 100 and len(tris) > 100
        r = np.linalg.norm(verts, axis=1)
        assert (np.abs(r - 1.0) < 0.2).mean() > 0.9

    def test_watertight_edges(self, rng):
        from collections import Counter
        c = _sphere_cloud(rng)
        _, tris = poisson_reconstruction(c, depth=4)
        cnt = Counter()
        for t in tris:
            for a, b in ((t[0], t[1]), (t[1], t[2]), (t[2], t[0])):
                cnt[(min(a, b), max(a, b))] += 1
        shared = sum(1 for v in cnt.values() if v == 2)
        assert shared / max(len(cnt), 1) > 0.95


class TestGP3:
    def test_plane_grid(self, rng):
        g = np.stack(
            np.meshgrid(np.linspace(0, 1, 15), np.linspace(0, 1, 15)), -1
        ).reshape(-1, 2)
        pts = np.concatenate([g, np.zeros((len(g), 1))], 1).astype(np.float32)
        c = make_cloud(jnp.asarray(pts))
        n = np.tile([0, 0, 1.0], (len(pts), 1)).astype(np.float32)
        c = c.with_attrs(normal=jnp.asarray(n))
        verts, tris = greedy_projection_triangulation(c, search_radius=0.3, mu=3.0)
        assert len(tris) > 150  # ~2*(14*14) expected, gates drop a few
        # all triangles flat in z, no degenerate area
        tv = verts[tris]
        ar = np.linalg.norm(
            np.cross(tv[:, 1] - tv[:, 0], tv[:, 2] - tv[:, 0]), axis=1
        )
        assert (ar > 1e-8).all()
        assert np.abs(tv[..., 2]).max() < 1e-6

    def test_edge_length_gate(self, rng):
        # two far clusters must not be bridged
        a = rng.uniform(0, 1, (60, 3)).astype(np.float32) * [1, 1, 0.01]
        b = a + np.float32([10, 0, 0])
        c = make_cloud(jnp.asarray(np.concatenate([a, b])))
        n = np.tile([0, 0, 1.0], (120, 1)).astype(np.float32)
        c = c.with_attrs(normal=jnp.asarray(n))
        verts, tris = greedy_projection_triangulation(c, search_radius=1.0, mu=2.5)
        tv = verts[tris]
        e = np.linalg.norm(tv - np.roll(tv, 1, axis=1), axis=2)
        assert e.max() < 5.0


class TestEarClipping:
    def test_convex_quad(self):
        v = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float32)
        tris = ear_clipping(v, [0, 1, 2, 3])
        assert len(tris) == 2
        area = 0.0
        for t in tris:
            p = v[t]
            area += 0.5 * np.linalg.norm(np.cross(p[1] - p[0], p[2] - p[0]))
        assert abs(area - 1.0) < 1e-6

    def test_concave_polygon(self):
        # L-shape: 6 vertices -> 4 triangles, total area 3
        v = np.array(
            [[0, 0, 0], [2, 0, 0], [2, 1, 0], [1, 1, 0], [1, 2, 0], [0, 2, 0]],
            np.float32,
        )
        tris = ear_clipping(v, list(range(6)))
        assert len(tris) == 4
        area = sum(
            0.5 * np.linalg.norm(np.cross(v[t[1]] - v[t[0]], v[t[2]] - v[t[0]]))
            for t in tris
        )
        assert abs(area - 3.0) < 1e-5

    def test_mesh_polygons(self):
        v = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float32)
        tris = triangulate_mesh_polygons(v, [[0, 1, 2, 3], [0, 1, 2]])
        assert len(tris) == 3


class TestGridProjection:
    def test_sphere_samples(self, rng):
        c = _sphere_cloud(rng)
        pts = grid_projection(c, resolution=24)
        assert len(pts) > 100
        r = np.linalg.norm(pts, axis=1)
        assert (np.abs(r - 1.0) < 0.25).mean() > 0.9


class TestSurfelSmoothing:
    def test_plane_denoise(self, rng):
        u = rng.uniform(-1, 1, size=(600, 2)).astype(np.float32)
        z = rng.normal(scale=0.03, size=600).astype(np.float32)
        pts = np.stack([u[:, 0], u[:, 1], z], 1)
        c = make_cloud(jnp.asarray(pts))
        n = np.tile([0, 0, 1.0], (600, 1)).astype(np.float32)
        c = c.with_attrs(normal=jnp.asarray(n))
        out = surfel_smoothing(c, radius=0.3, max_iterations=5)
        assert np.asarray(out.xyz)[:, 2].std() < z.std() * 0.5


class TestBilateralUpsampling:
    def test_fills_holes(self):
        H, W = 32, 32
        depth = np.full((H, W), 2.0, np.float32)
        depth[10:14, 10:14] = 0.0  # hole
        rgb = np.ones((H, W, 3), np.float32) * 0.5
        out = np.asarray(bilateral_upsampling(jnp.asarray(depth), jnp.asarray(rgb)))
        assert np.abs(out[11, 11] - 2.0) < 0.05
        assert np.abs(out - 2.0).max() < 0.1

    def test_edge_preserving(self):
        H, W = 32, 32
        depth = np.full((H, W), 1.0, np.float32)
        depth[:, 16:] = 3.0
        rgb = np.zeros((H, W, 3), np.float32)
        rgb[:, 16:] = 1.0
        out = np.asarray(bilateral_upsampling(jnp.asarray(depth), jnp.asarray(rgb),
                                              sigma_color=0.1, sigma_depth=0.2))
        assert abs(out[5, 5] - 1.0) < 0.05
        assert abs(out[5, 25] - 3.0) < 0.05


class TestTextureMapping:
    def test_frontal_projection(self):
        v = np.array(
            [[-0.5, -0.5, 2.0], [0.5, -0.5, 2.0], [0.0, 0.5, 2.0], [0, 0, -5.0]],
            np.float32,
        )
        tris = np.array([[0, 1, 2], [0, 1, 3]], np.int32)
        uv, vis = texture_mapping(
            v, tris, np.eye(4), fx=100, fy=100, cx=64, cy=64, width=128, height=128
        )
        assert vis[0] and not vis[1]  # vertex 3 behind camera
        assert (uv[:3] >= 0).all() and (uv[:3] <= 1).all()
        # symmetry: vertices 0/1 mirrored around u=0.5
        assert abs((uv[0, 0] + uv[1, 0]) - 1.0) < 1e-5
