"""Linear octree tests — morton roundtrip + behavior vs direct computation."""

import numpy as np
import jax.numpy as jnp

from pcl_tpu import octree as oc


class TestMorton:
    def test_roundtrip(self, rng):
        cells = rng.integers(0, 1024, size=(500, 3)).astype(np.int32)
        keys = oc.morton_encode(jnp.asarray(cells))
        back = np.asarray(oc.morton_decode(keys))
        np.testing.assert_array_equal(back, cells)

    def test_ordering_locality(self):
        # consecutive cells along one axis share high bits
        a = oc.morton_encode(jnp.asarray([[0, 0, 0]], np.int32))
        b = oc.morton_encode(jnp.asarray([[1, 0, 0]], np.int32))
        assert int(a[0]) == 0 and int(b[0]) == 1


class TestOctree:
    def test_occupancy(self, rng):
        pts = rng.uniform(0, 1, size=(300, 3)).astype(np.float32)
        tree = oc.build(jnp.asarray(pts), jnp.ones(300, bool), 0.1)
        occ = np.asarray(oc.is_voxel_occupied(tree, jnp.asarray(pts)))
        assert occ.all()
        far = pts + 50.0
        occ2 = np.asarray(oc.is_voxel_occupied(tree, jnp.asarray(far)))
        assert not occ2.any()

    def test_voxel_search(self, rng):
        pts = rng.uniform(0, 1, size=(400, 3)).astype(np.float32)
        res = 0.25
        tree = oc.build(jnp.asarray(pts), jnp.ones(400, bool), res,
                        origin=jnp.zeros(3))
        idx, valid = oc.voxel_search(tree, jnp.asarray(pts[:50]), cap=64)
        cells = np.floor(pts / res).astype(int)
        for q in range(50):
            expect = set(np.flatnonzero((cells == cells[q]).all(axis=1)))
            got = set(np.asarray(idx)[q][np.asarray(valid)[q]])
            assert got == expect

    def test_leaf_count_and_centroids(self, rng):
        pts = rng.uniform(0, 1, size=(500, 3)).astype(np.float32)
        res = 0.2
        tree = oc.build(jnp.asarray(pts), jnp.ones(500, bool), res)
        cells = np.floor((pts - np.asarray(tree.origin)) / res).astype(int)
        n_unique = len(np.unique(cells, axis=0))
        assert int(tree.leaf_count) == n_unique
        cent, cnt, n_leaves = oc.leaf_centroids(tree, jnp.asarray(pts))
        assert int(n_leaves) == n_unique
        assert abs(float(jnp.sum(cnt)) - 500) < 1e-3

    def test_change_detection(self, rng):
        a = rng.uniform(0, 1, size=(300, 3)).astype(np.float32)
        moved = a.copy()
        moved[:40] += 5.0  # 40 points move to new voxels
        res = 0.1
        origin = jnp.zeros(3)
        t0 = oc.build(jnp.asarray(a), jnp.ones(300, bool), res, origin=origin)
        t1 = oc.build(jnp.asarray(moved), jnp.ones(300, bool), res, origin=origin)
        new = np.asarray(oc.change_detection(t1, t0))
        assert new[:40].all()
        assert not new[40:].any()

    def test_box_search(self, rng):
        pts = rng.uniform(0, 1, size=(400, 3)).astype(np.float32)
        tree = oc.build(jnp.asarray(pts), jnp.ones(400, bool), 0.1)
        bmin = jnp.asarray([0.2, 0.2, 0.2])
        bmax = jnp.asarray([0.6, 0.6, 0.6])
        idx, valid, count = oc.box_search(tree, bmin, bmax, jnp.asarray(pts))
        expect = np.flatnonzero(((pts >= 0.2) & (pts <= 0.6)).all(axis=1))
        assert int(count) == len(expect)
        got = np.sort(np.asarray(idx)[np.asarray(valid)])
        np.testing.assert_array_equal(got, expect)

    def test_at_depth_counts(self, rng):
        pts = rng.uniform(0, 1, size=(500, 3)).astype(np.float32)
        res = 0.05
        tree = oc.build(jnp.asarray(pts), jnp.ones(500, bool), res, depth=8)
        # level depth-1: each node is a 2x2x2 block of leaves
        k, first = oc.at_depth(tree, 7)
        cells = np.floor((pts - np.asarray(tree.origin)) / res).astype(int) // 2
        assert int(jnp.sum(first.astype(jnp.int32))) == len(np.unique(cells, axis=0))
