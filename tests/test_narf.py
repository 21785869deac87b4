"""NARF border/keypoint/descriptor tests on synthetic range images
(mirrors the reference's narf tests: box in front of a wall)."""

import numpy as np
import jax
import jax.numpy as jnp

from pcl_tpu.core.cloud import Cloud
from pcl_tpu.core.range_image import create_from_cloud
from pcl_tpu.features import (
    extract_borders, narf_keypoints, narf_descriptors,
    BORDER_OBSTACLE, BORDER_SHADOW,
)


def box_in_front_of_wall(rng):
    """Dense wall at z=4 with a box face at z=2 — strong borders at the box
    silhouette."""
    n = 60
    g = np.linspace(-1, 1, n, dtype=np.float32)
    gx, gy = np.meshgrid(g, g)
    wall = np.stack([2.5 * gx.ravel(), 2.5 * gy.ravel(),
                     np.full(n * n, 4.0, np.float32)], 1)
    box = np.stack([0.5 * gx.ravel(), 0.5 * gy.ravel(),
                    np.full(n * n, 2.0, np.float32)], 1)
    pts = np.concatenate([wall, box]).astype(np.float32)
    return Cloud(xyz=jnp.asarray(pts), mask=jnp.ones(len(pts), bool))


class TestBorders:
    def test_box_silhouette_is_obstacle_border(self, rng):
        c = box_in_front_of_wall(rng)
        ri = create_from_cloud(c, angular_resolution=np.deg2rad(0.6),
                               width=200, height=150)
        b = extract_borders(ri)
        bt = np.asarray(b.border_type)
        assert (bt == BORDER_OBSTACLE).sum() > 20
        assert (bt == BORDER_SHADOW).sum() > 10
        # obstacle borders are at box depth (outline of the near face):
        r = np.asarray(ri.ranges)
        obstacle_ranges = r[bt == BORDER_OBSTACLE]
        assert np.median(obstacle_ranges) < 3.0


class TestKeypointsAndDescriptors:
    def test_keypoints_on_box_corners(self, rng):
        c = box_in_front_of_wall(rng)
        ri = create_from_cloud(c, angular_resolution=np.deg2rad(0.6),
                               width=200, height=150)
        rc, scores, valid = narf_keypoints(ri, max_keypoints=64,
                                           min_interest=0.3)
        assert int(np.asarray(valid).sum()) >= 4
        # keypoints sit on observed pixels
        r = np.asarray(ri.ranges)
        rcv = np.asarray(rc)[np.asarray(valid)]
        assert np.isfinite(r[rcv[:, 0], rcv[:, 1]]).all()

    def test_descriptor_shape_and_stability(self, rng):
        c = box_in_front_of_wall(rng)
        ri = create_from_cloud(c, angular_resolution=np.deg2rad(0.6),
                               width=200, height=150)
        rc, _, valid = narf_keypoints(ri, max_keypoints=32, min_interest=0.3)
        d = np.asarray(narf_descriptors(ri, rc))
        assert d.shape == (32, 36)
        assert np.isfinite(d).all()
        assert (np.abs(d) <= 1.0 + 1e-6).all()
        # descriptors at valid keypoints are non-trivial
        v = np.asarray(valid)
        assert np.abs(d[v]).sum(axis=1).min() > 0.01
