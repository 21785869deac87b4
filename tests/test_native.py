"""Native host runtime (C++ kd-tree / morton / voxel binning) vs NumPy
oracles — replicates the reference's backend-vs-bruteforce strategy
(test/search/test_search.cpp:114)."""

import numpy as np
import pytest

from pcl_tpu import native


@pytest.fixture(scope="module")
def cloud():
    rng = np.random.default_rng(3)
    return rng.uniform(-1, 1, size=(2000, 3)).astype(np.float32)


def test_native_builds():
    # the image has g++; the native path must actually engage
    assert native.available()


def test_kdtree_knn_matches_bruteforce(cloud):
    rng = np.random.default_rng(4)
    q = rng.uniform(-1, 1, size=(64, 3)).astype(np.float32)
    tree = native.KdTree(cloud)
    d2, ii = tree.knn(q, 8)
    d2_ref, ii_ref = native._knn_numpy(cloud, q, 8)
    np.testing.assert_allclose(d2, d2_ref, rtol=1e-5, atol=1e-6)
    # indices may differ under distance ties; compare distances of indices
    got = ((q[:, None, :] - cloud[ii]) ** 2).sum(-1)
    np.testing.assert_allclose(got, d2_ref, rtol=1e-5, atol=1e-6)


def test_kdtree_knn_k_exceeds_n():
    pts = np.zeros((3, 3), np.float32)
    pts[1] = [1, 0, 0]
    pts[2] = [2, 0, 0]
    tree = native.KdTree(pts)
    d2, ii = tree.knn(np.zeros((1, 3), np.float32), 5)
    assert (ii[0, :3] >= 0).all() and (ii[0, 3:] == -1).all()
    assert np.isinf(d2[0, 3:]).all()
    np.testing.assert_allclose(d2[0, :3], [0.0, 1.0, 4.0], atol=1e-6)


def test_kdtree_radius_matches_and_sorted(cloud):
    rng = np.random.default_rng(5)
    q = rng.uniform(-1, 1, size=(32, 3)).astype(np.float32)
    tree = native.KdTree(cloud)
    r = 0.25
    d2, ii, cnt = tree.radius(q, r, cap=128)
    d2_all = ((q[:, None, :] - cloud[None]) ** 2).sum(-1)
    cnt_ref = (d2_all <= r * r).sum(axis=1)
    np.testing.assert_array_equal(cnt, cnt_ref)
    for j in range(q.shape[0]):
        m = min(int(cnt[j]), 128)
        assert (np.diff(d2[j, :m]) >= -1e-7).all()  # sorted ascending
        assert (d2[j, :m] <= r * r + 1e-6).all()
        assert (ii[j, :m] >= 0).all()


def test_kdtree_radius_overflow_count(cloud):
    tree = native.KdTree(cloud)
    q = np.zeros((1, 3), np.float32)
    d2, ii, cnt = tree.radius(q, 10.0, cap=16)
    assert int(cnt[0]) == cloud.shape[0]  # true count reported past the cap
    assert (ii[0] >= 0).all()


def test_morton_locality():
    rng = np.random.default_rng(6)
    pts = rng.uniform(0, 1, size=(512, 3)).astype(np.float32)
    order = native.morton_argsort(pts)
    assert sorted(order.tolist()) == list(range(512))
    # morton ordering keeps consecutive points spatially close on average:
    # mean consecutive distance well below random-order expectation (~0.66)
    d = np.linalg.norm(np.diff(pts[order], axis=0), axis=1)
    assert d.mean() < 0.35


def test_morton_encode_consistency():
    pts = np.array([[0, 0, 0], [1, 1, 1], [0.5, 0.5, 0.5]], np.float32)
    codes = native.morton_encode(pts)
    assert codes[0] < codes[2] < codes[1]


def test_voxel_centroids_against_numpy():
    rng = np.random.default_rng(7)
    pts = rng.uniform(-1, 1, size=(1000, 3)).astype(np.float32)
    got = native.voxel_centroids(pts, 0.3)
    # oracle: independent groupby
    lo = pts.min(axis=0)
    key = np.floor((pts - lo) / 0.3).astype(np.int64)
    uniq = {}
    for p, k in zip(pts, map(tuple, key)):
        uniq.setdefault(k, []).append(p)
    ref = np.array([np.mean(v, axis=0) for v in uniq.values()], np.float32)
    assert got.shape == ref.shape
    got_s = got[np.lexsort(got.T)]
    ref_s = ref[np.lexsort(ref.T)]
    np.testing.assert_allclose(got_s, ref_s, atol=1e-5)
