"""Filter golden-value parity against the reference's own asserts
(reference: test/filters/test_filters.cpp on bun0.pcd). These pin not just
counts but CONTENT AND ORDERING: the voxel grid's output order (z-major
linear leaf ids) and centroid values match the reference to 1e-4."""

import numpy as np
import pytest

from conftest import reference_pcd
from pcl_tpu.io import pcd as pcd_io


@pytest.fixture(scope="module")
def bun0():
    return pcd_io.load(reference_pcd("bun0.pcd"))


class TestPassThroughGolden:
    def test_z_window(self, bun0):
        """reference test_filters.cpp:279+ — z in [0.05, 0.1]."""
        from pcl_tpu.filters import pass_through
        out = pass_through(bun0, "z", 0.05, 0.1)
        m = np.asarray(out.mask)
        xyz = np.asarray(out.xyz)[m]
        assert m.sum() == 42
        np.testing.assert_allclose(xyz[0], [-0.074556, 0.13415, 0.051046],
                                   atol=1e-5)
        np.testing.assert_allclose(xyz[41], [-0.030331, 0.039749, 0.052133],
                                   atol=1e-5)


class TestVoxelGridGolden:
    def test_leaf_002(self, bun0):
        """reference test_filters.cpp:566-597 — counts, then counts +
        CENTROIDS + OUTPUT ORDER with the z pre-filter."""
        from pcl_tpu.filters import voxel_downsample
        v = voxel_downsample(bun0, 0.02)
        assert int(v.count) == 103
        zsel = bun0.with_mask(bun0.mask & (bun0.xyz[:, 2] >= 0.05)
                              & (bun0.xyz[:, 2] <= 0.1))
        v2 = voxel_downsample(zsel, 0.02)
        assert int(v2.count) == 14
        xyz = np.asarray(v2.xyz)[np.asarray(v2.mask)]
        np.testing.assert_allclose(xyz[0], [-0.026125, 0.039788, 0.052827],
                                   atol=1e-4)
        np.testing.assert_allclose(xyz[13], [-0.073202, 0.1296, 0.051333],
                                   atol=1e-4)


class TestOutlierRemovalGolden:
    def test_statistical(self, bun0):
        """reference test_filters.cpp:1587+ — meanK 50, stddev 1.0."""
        from pcl_tpu.filters import statistical_outlier_removal
        s = statistical_outlier_removal(bun0, mean_k=50, stddev_mult=1.0,
                                        backend="bruteforce")
        m = np.asarray(s.mask)
        xyz = np.asarray(s.xyz)[m]
        assert m.sum() == 352
        np.testing.assert_allclose(xyz[-1], [-0.034667, 0.15131, -0.00071029],
                                   atol=1e-4)
        neg = statistical_outlier_removal(bun0, mean_k=50, stddev_mult=1.0,
                                          negative=True, backend="bruteforce")
        mn = np.asarray(neg.mask)
        xn = np.asarray(neg.xyz)[mn]
        assert mn.sum() == 397 - 352
        assert abs(xn[-1][0] - (-0.07793)) < 1e-4

    def test_radius(self, bun0):
        """reference test_filters.cpp:1494+ — r 0.02, min 14 neighbors."""
        from pcl_tpu.filters import radius_outlier_removal
        r = radius_outlier_removal(bun0, 0.02, min_neighbors=14,
                                   backend="bruteforce")
        assert int(np.asarray(r.mask).sum()) == 307
        rn = radius_outlier_removal(bun0, 0.02, min_neighbors=14,
                                    negative=True, backend="bruteforce")
        assert int(np.asarray(rn.mask).sum()) == 90
        # the cell backend must agree with the brute decisions
        rc = radius_outlier_removal(bun0, 0.02, min_neighbors=14,
                                    backend="cell")
        np.testing.assert_array_equal(np.asarray(rc.mask), np.asarray(r.mask))
