"""Tests for people (HOG + detector), simulation, outofcore."""

import numpy as np
import jax
import jax.numpy as jnp

from pcl_tpu.core.cloud import make_cloud, from_numpy, to_numpy


class TestHOG:
    def test_gradient_structure(self, rng):
        from pcl_tpu.people import hog_features
        # vertical stripes: all gradient energy in the horizontal direction
        img = jnp.asarray(np.tile((np.arange(64) % 8 < 4).astype(np.float32), (64, 1)))
        f = np.asarray(hog_features(img))
        assert f.shape[1] == 4 * 9
        assert np.isfinite(f).all()
        blocks = f.reshape(len(f), 4, 9)
        # dominant orientation bin = 0 (horizontal gradient, unsigned)
        dom = blocks.sum(axis=(0, 1)).argmax()
        assert dom in (0, 8)


class TestPeopleDetector:
    def test_detects_person_sized_cluster(self, rng):
        from pcl_tpu.people import GroundBasedPeopleDetector
        # ground plane + a 1.7m-tall blob + a small object
        g = np.stack([rng.uniform(0, 5, 2000), rng.uniform(0, 5, 2000),
                      rng.normal(scale=0.01, size=2000)], 1)
        # tapered person: narrow at the top like a head, so head-based
        # subclustering (which splits flat-topped blobs, correctly) keeps
        # it as ONE candidate
        z = rng.uniform(0.05, 1.7, 400)
        spread = 0.15 * (1.0 - 0.55 * z / 1.7)
        person = np.stack([
            2.0 + rng.normal(size=400) * spread,
            2.0 + rng.normal(size=400) * spread,
            z,
        ], 1)
        box = np.stack([
            4.0 + rng.normal(scale=0.1, size=100),
            1.0 + rng.normal(scale=0.1, size=100),
            rng.uniform(0.05, 0.4, 100),
        ], 1)
        pts = np.concatenate([g, person, box]).astype(np.float32)
        det = GroundBasedPeopleDetector(min_points=50)
        out = det.detect(make_cloud(jnp.asarray(pts)), key=jax.random.PRNGKey(0))
        assert len(out) == 1
        assert 1.5 < out[0].height < 1.9
        np.testing.assert_allclose(out[0].centroid[:2], [2.0, 2.0], atol=0.2)


class TestSimulation:
    def test_render_and_likelihood(self, rng):
        from pcl_tpu.simulation import render_depth, range_likelihood
        from pcl_tpu.fusion.tsdf import Intrinsics
        intr = Intrinsics(fx=60.0, fy=60.0, cx=32.0, cy=24.0)
        # dense wall at z=2
        u = rng.uniform(-1, 1, size=(5000, 2)).astype(np.float32)
        pts = np.stack([u[:, 0], u[:, 1], np.full(len(u), 2.0, np.float32)], 1)
        c = make_cloud(jnp.asarray(pts))
        d = render_depth(c, jnp.eye(4), intr, 48, 64)
        dd = np.asarray(d)
        assert (np.abs(dd[dd > 0] - 2.0) < 1e-4).all()
        # likelihood: correct pose scores higher than shifted pose
        obs = d
        d_shift = render_depth(c, jnp.eye(4).at[2, 3].set(0.3), intr, 48, 64)
        ll_good = float(range_likelihood(d, obs))
        ll_bad = float(range_likelihood(d_shift, obs))
        assert ll_good > ll_bad


class TestOutofcore:
    def test_roundtrip_and_box_query(self, tmp_path, rng):
        from pcl_tpu.outofcore import OutofcoreOctree
        store = OutofcoreOctree.create(str(tmp_path / "oc"), cell_size=0.25,
                                       split_depth=2, lod_points=16)
        a = rng.uniform(0, 4, size=(2000, 3)).astype(np.float32)
        b = rng.uniform(4, 8, size=(1000, 3)).astype(np.float32)
        store.add_cloud(from_numpy(a))
        store.add_cloud(from_numpy(b))
        assert store.meta["n_points"] == 3000
        assert len(store.node_keys()) > 4
        # box query returns exactly the points inside
        out = store.query_box([1, 1, 1], [3, 3, 3])
        xyz, _ = to_numpy(out)
        expect = ((a >= 1) & (a <= 3)).all(axis=1).sum()
        assert len(xyz) == expect
        # LOD returns fewer points
        lod = store.query_box([0, 0, 0], [8, 8, 8], lod=2)
        xl, _ = to_numpy(lod)
        assert 0 < len(xl) < 3000
        # every LOD point is a real stored point (oracle: set membership)
        allpts = np.concatenate([a, b])
        from scipy.spatial import cKDTree
        d, _ = cKDTree(allpts).query(xl)
        assert d.max() == 0.0

    def test_frustum_query_oracle(self, tmp_path, rng):
        from pcl_tpu.outofcore import OutofcoreOctree
        store = OutofcoreOctree.create(str(tmp_path / "oc"), cell_size=0.25,
                                       split_depth=2, lod_points=16)
        pts = rng.uniform(0, 8, size=(3000, 3)).astype(np.float32)
        store.add_cloud(from_numpy(pts))
        # axis-aligned frustum (a box expressed as 6 inward planes) so the
        # numpy oracle is exact
        planes = np.array([
            [1, 0, 0, -2], [-1, 0, 0, 6],     # 2 <= x <= 6
            [0, 1, 0, -1], [0, -1, 0, 5],     # 1 <= y <= 5
            [0, 0, 1, -3], [0, 0, -1, 7],     # 3 <= z <= 7
        ], np.float64)
        out = store.query_frustum(planes)
        xyz, _ = to_numpy(out)
        inside = ((pts @ planes[:, :3].T + planes[None, :, 3]) >= 0).all(axis=1)
        assert len(xyz) == inside.sum()
        # and a genuinely oblique frustum stays consistent with the
        # per-point oracle
        oblq = np.array([[1, 1, 0, -5], [-1, 0, 1, 2]], np.float64)
        out2 = store.query_frustum(oblq)
        x2, _ = to_numpy(out2)
        ins2 = ((pts @ oblq[:, :3].T + oblq[None, :, 3]) >= 0).all(axis=1)
        assert len(x2) == ins2.sum()
        # LOD frustum query returns a subset of real points
        lodc = store.query_frustum(planes, lod=2)
        xl, _ = to_numpy(lodc)
        if len(xl):
            from scipy.spatial import cKDTree
            assert cKDTree(pts).query(xl)[0].max() == 0.0
