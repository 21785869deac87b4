"""Surface tests — MLS denoising on analytic surfaces."""

import numpy as np
import jax.numpy as jnp

from pcl_tpu.core.cloud import make_cloud, ATTR_NORMAL
from pcl_tpu.surface import moving_least_squares


class TestMLS:
    def test_denoises_plane(self, rng):
        u = rng.uniform(-1, 1, size=(800, 2)).astype(np.float32)
        noise = rng.normal(scale=0.02, size=800).astype(np.float32)
        pts = np.stack([u[:, 0], u[:, 1], noise], 1)
        c = make_cloud(jnp.asarray(pts))
        out = moving_least_squares(c, search_radius=0.3)
        z = np.asarray(out.xyz)[:, 2]
        # residual z spread shrinks substantially
        assert z.std() < noise.std() * 0.4
        n = np.asarray(out.attrs[ATTR_NORMAL])
        assert (np.abs(n[:, 2]) > 0.99).mean() > 0.95

    def test_preserves_curved_surface(self, rng):
        # paraboloid z = 0.5(x^2+y^2): order-2 MLS must NOT flatten it
        u = rng.uniform(-1, 1, size=(1000, 2)).astype(np.float32)
        z = 0.5 * (u[:, 0] ** 2 + u[:, 1] ** 2)
        pts = np.stack([u[:, 0], u[:, 1], z], 1).astype(np.float32)
        noisy = pts + rng.normal(scale=0.01, size=pts.shape).astype(np.float32)
        c = make_cloud(jnp.asarray(noisy))
        out = moving_least_squares(c, search_radius=0.3)
        sm = np.asarray(out.xyz)
        # smoothed points lie closer to the true surface than the noisy ones
        res_before = np.abs(noisy[:, 2] - 0.5 * (noisy[:, 0] ** 2 + noisy[:, 1] ** 2))
        res_after = np.abs(sm[:, 2] - 0.5 * (sm[:, 0] ** 2 + sm[:, 1] ** 2))
        assert res_after.mean() < res_before.mean() * 0.5

    def test_isolated_points_unmoved(self, rng):
        pts = np.array([[0, 0, 0], [10, 10, 10]], np.float32)
        c = make_cloud(jnp.asarray(pts))
        out = moving_least_squares(c, search_radius=0.5, k=8)
        np.testing.assert_allclose(np.asarray(out.xyz), pts, atol=1e-6)


class TestReconstruction:
    def test_hoppe_sphere_mesh(self, rng):
        from pcl_tpu import features
        from pcl_tpu.surface import reconstruct_hoppe
        d = rng.normal(size=(2000, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        c = make_cloud(jnp.asarray(d))
        c = features.estimate_normals(c, k=12, viewpoint=jnp.zeros(3))
        # normals must point outward for a consistent SDF; viewpoint at the
        # center gives inward normals -> flip
        c = c.with_attrs(normal=-c.attrs[ATTR_NORMAL])
        verts, tris = reconstruct_hoppe(c, resolution=32)
        assert len(verts) > 100 and len(tris) > 100
        r = np.linalg.norm(verts, axis=1)
        assert (np.abs(r - 1.0) < 0.15).mean() > 0.95
        # closed surface: every edge shared by exactly 2 triangles
        from collections import Counter
        e = Counter()
        for t in tris:
            for a, b in ((0, 1), (1, 2), (2, 0)):
                e[tuple(sorted((t[a], t[b])))] += 1
        counts = np.array(list(e.values()))
        assert (counts == 2).mean() > 0.95

    def test_organized_fast_mesh(self, rng):
        from pcl_tpu.surface import organized_fast_mesh
        from pcl_tpu.core.cloud import make_cloud as mk
        H, W = 10, 12
        v, u = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
        xyz = np.stack([u, v, np.ones_like(u)], -1).reshape(-1, 3).astype(np.float32)
        mask = np.ones(H * W, bool)
        mask[0] = False   # one hole
        c = mk(jnp.asarray(xyz), jnp.asarray(mask), width=W, height=H)
        verts, tris = organized_fast_mesh(c)
        assert len(tris) == 2 * (H - 1) * (W - 1) - 2  # two triangles lost at the hole
        assert tris.max() < H * W


class TestHulls:
    def test_convex_hull_cube(self, rng):
        from pcl_tpu.surface import convex_hull
        pts = rng.uniform(-1, 1, size=(500, 3)).astype(np.float32)
        corners = np.array([[x, y, z] for x in (-1, 1) for y in (-1, 1) for z in (-1, 1)], np.float32)
        allp = np.concatenate([pts * 0.5, corners])
        verts, simplices = convex_hull(make_cloud(jnp.asarray(allp)))
        assert len(verts) == 8           # exactly the corners
        np.testing.assert_allclose(np.abs(verts), 1.0, atol=1e-6)

    def test_concave_hull_2d(self, rng):
        from pcl_tpu.surface import concave_hull
        # L-shaped region: concave hull with small alpha follows the notch
        pts = rng.uniform(0, 2, size=(3000, 2)).astype(np.float32)
        keep = ~((pts[:, 0] > 1) & (pts[:, 1] > 1))
        pts = pts[keep]
        xyz = np.concatenate([pts, np.zeros((len(pts), 1), np.float32)], 1)
        verts, edges = concave_hull(make_cloud(jnp.asarray(xyz)), alpha=0.12, dim=2)
        assert len(edges) > 20
        # boundary must include points near the inner corner (1,1) — a
        # CONVEX hull could never have one there
        dist_corner = np.linalg.norm(verts[:, :2] - [1, 1], axis=1)
        assert dist_corner.min() < 0.15

    def test_concave_hull_100k_fast(self, rng):
        """VERDICT r3 #8: vectorized circumradius filter — 100k points in
        well under 2 s (was an O(N) interpreted per-simplex loop)."""
        import time
        from pcl_tpu.surface import concave_hull
        pts = rng.uniform(0, 10, size=(100_000, 2)).astype(np.float32)
        xyz = np.concatenate([pts, np.zeros((len(pts), 1), np.float32)], 1)
        t0 = time.perf_counter()
        verts, edges = concave_hull(make_cloud(jnp.asarray(xyz)), alpha=0.5,
                                    dim=2)
        dt = time.perf_counter() - t0
        assert len(edges) > 100
        assert dt < 2.0, f"concave hull took {dt:.2f}s"

    def test_concave_hull_3d(self, rng):
        """3D alpha shape on a dense cube sample: boundary faces form a
        closed-ish surface near the cube faces (exercises the vectorized
        tetrahedron circumradius path)."""
        from pcl_tpu.surface import concave_hull
        pts = rng.uniform(-1, 1, size=(4000, 3)).astype(np.float32)
        verts, faces = concave_hull(make_cloud(jnp.asarray(pts)), alpha=0.6,
                                    dim=3)
        assert len(faces) > 100
        # boundary vertices should hug the cube surface
        r = np.max(np.abs(verts), axis=1)
        assert np.median(r) > 0.7
