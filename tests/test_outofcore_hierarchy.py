"""Hierarchical disk octree (outofcore/hierarchy.py): splitting,
metadata, iterators, LOD, depth-bounded queries — the reference
octree_base parity surface."""

import numpy as np

from pcl_tpu.outofcore import HierarchicalOutofcoreOctree


def _tree(tmp_path, n=20000, seed=0, ppn=1024, max_depth=5):
    rng = np.random.default_rng(seed)
    pts = rng.uniform(0, 1, size=(n, 3)).astype(np.float32)
    t = HierarchicalOutofcoreOctree.create(
        str(tmp_path / "oct"), [0, 0, 0], [1, 1, 1],
        max_depth=max_depth, points_per_node=ppn)
    accepted = t.add_points(pts)
    assert accepted == n
    return t, pts


class TestInsertSplit:
    def test_splits_and_counts(self, tmp_path):
        t, pts = _tree(tmp_path)
        s = t.tree_stats()
        assert s["points"] == len(pts)            # no point lost
        assert s["nodes"] > 8                     # genuinely split
        assert s["depth"] >= 2
        # every leaf within budget (except forced max-depth leaves)
        for d, meta in t.depth_first():
            if not any(meta["children"]) and meta["depth"] < 5:
                assert meta["point_count"] <= 1024

    def test_out_of_bounds_dropped(self, tmp_path):
        t, _ = _tree(tmp_path, n=100)
        acc = t.add_points(np.array([[2.0, 2.0, 2.0], [0.5, 0.5, 0.5]],
                                    np.float32))
        assert acc == 1

    def test_reopen(self, tmp_path):
        t, pts = _tree(tmp_path, n=5000)
        t2 = HierarchicalOutofcoreOctree(t.root)
        assert t2.tree_stats()["points"] == len(pts)


class TestIterators:
    def test_dfs_bfs_cover_same_nodes(self, tmp_path):
        t, _ = _tree(tmp_path, n=8000)
        dfs = [d for d, _m in t.depth_first()]
        bfs = [d for d, _m in t.breadth_first()]
        assert sorted(dfs) == sorted(bfs)
        # BFS is by depth
        depths = [m["depth"] for _d, m in t.breadth_first()]
        assert depths == sorted(depths)


class TestQueries:
    def test_box_query_exact(self, tmp_path):
        t, pts = _tree(tmp_path)
        bmin, bmax = [0.2, 0.2, 0.2], [0.5, 0.6, 0.4]
        got = np.asarray(t.query_bb_includes(bmin, bmax).xyz)
        want = pts[((pts >= bmin) & (pts <= bmax)).all(axis=1)]
        assert len(got) == len(want)
        # set equality via sorted lexicographic rows
        assert np.allclose(np.sort(got.view("f4,f4,f4"), axis=0).view(np.float32),
                           np.sort(want.view("f4,f4,f4"), axis=0).view(np.float32))

    def test_lod_depth_query(self, tmp_path):
        t, pts = _tree(tmp_path)
        t.build_lod(sample_fraction=0.1)
        full = np.asarray(t.query_bb_includes([0, 0, 0], [1, 1, 1]).xyz)
        coarse = np.asarray(t.query_bb_includes([0, 0, 0], [1, 1, 1],
                                                depth=1).xyz)
        assert len(full) == len(pts)
        assert 0 < len(coarse) < len(full) * 0.5   # genuinely subsampled

    def test_occupied_centers(self, tmp_path):
        t, _ = _tree(tmp_path, n=4000, ppn=512)
        c1 = t.get_occupied_voxel_centers(1)
        assert 1 <= len(c1) <= 8
        c3 = t.get_occupied_voxel_centers(3)
        assert len(c3) >= len(c1)
