"""Line/plane intersections vs the reference's pinned values
(test/common/test_plane_intersection.cpp)."""

import numpy as np

from pcl_tpu.core.intersections import (
    line_to_line_segment,
    line_with_line_intersection,
    plane_with_plane_intersection,
    three_planes_intersection,
)


def test_line_with_line_intersection():
    # case 1 (:50-80): skew lines, default eps -> no intersection, zero pt
    la = [0.01, 0.02, 0.03, 0.4, 0.5, 0.6]
    lb = [0.1, 0.2, 0.3, 0.04, 0.05, 0.06]
    p1, p2 = line_to_line_segment(la, lb)
    assert np.sum((p1 - p2) ** 2) > 1e-4
    ok, pt = line_with_line_intersection(la, lb)
    assert not ok and (pt == 0).all()
    # case 2 (:117-160): near-intersecting with loose eps -> p1 returned
    la = [0.001, 0.002, 0.003, 0.004, 0.005, 0.006]
    lb = [0.00157, 0.00233, 0.00378, 0.00495, 0.00565, 0.00666]
    p1, p2 = line_to_line_segment(la, lb)
    assert np.sum((p1 - p2) ** 2) < 1e-1
    ok, pt = line_with_line_intersection(la, lb, sqr_eps=1e-1)
    assert ok
    np.testing.assert_allclose(pt, p1)


def test_plane_with_plane_intersection():
    # parallel planes -> False (:199-207)
    ok, _ = plane_with_plane_intersection(
        [1.0, 2.0, 3.0, 0.0], [1.0, 2.0, 3.0, 1.0], 1e-6)
    assert not ok
    # pinned line (:209-230)
    ok, line = plane_with_plane_intersection(
        [1.0, 2.0, 3.0, -0.5], [1.0, 2.5, 3.0, 0.5], 1e-3)
    assert ok
    np.testing.assert_allclose(
        line, [0.45, -2.0, 1.35, -1.5, 0.0, 0.5], atol=1e-4)
    # orthogonal unit planes (:232-252)
    ok, line = plane_with_plane_intersection(
        [0.0, 0.0, 1.0, 0.0], [1.0, 0.0, 0.0, -0.5], 0.1)
    assert ok
    np.testing.assert_allclose(
        line, [0.5, 0.0, 0.0, 0.0, 1.0, 0.0], atol=1e-5)
    # general case (:254-276)
    ok, line = plane_with_plane_intersection(
        [24.234, -22.234, 3.0823, -24.5], [689.0, 1239.01, 1.0003, 0.5], 0.1)
    assert ok
    np.testing.assert_allclose(
        line, [0.662983, -0.369141, 0.0732528, -3841.24, 2099.46, 45345.4],
        atol=1e-2)


def test_three_planes_intersection():
    # two parallel planes -> False (:287-292)
    ok, _ = three_planes_intersection(
        [1.0, 0.0, 0.0, -0.5], [1.0, 0.0, 0.0, 0.5], [0.0, 0.0, 1.0, -0.5],
        1e-6)
    assert not ok
    # unit cube corner (:300-310)
    ok, pt = three_planes_intersection(
        [1.0, 0.0, 0.0, -0.5], [0.0, 1.0, 0.0, 0.5], [0.0, 0.0, 1.0, -0.5])
    assert ok
    np.testing.assert_allclose(pt, [0.5, -0.5, 0.5])
    # general pinned case (:312-330)
    ok, pt = three_planes_intersection(
        [1.4564, 0.5465, -0.1325, 0.4685],
        [-1.5619, 5.5461, 5.4569, 2.9414],
        [0.9852, 654.55, -0.1546, -45.1516])
    assert ok
    np.testing.assert_allclose(pt, [-0.413977, 0.0694323, -0.728082],
                               atol=1e-4)
