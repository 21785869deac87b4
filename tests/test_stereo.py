"""Stereo matching tests — synthetic shifted pattern."""

import numpy as np
import jax.numpy as jnp

from pcl_tpu.stereo import block_matching, disparity_to_cloud
from pcl_tpu.core.cloud import to_numpy


def make_pair(rng, H=64, W=128, d_true=7):
    """Right image + left image shifted by d_true (textured pattern)."""
    right = rng.random((H, W)).astype(np.float32)
    right = 0.5 * right + 0.5 * np.roll(right, 1, axis=1)  # correlate a bit
    left = np.roll(right, d_true, axis=1)
    return left, right


class TestBlockMatching:
    def test_constant_disparity(self, rng):
        d_true = 7
        left, right = make_pair(rng, d_true=d_true)
        disp = np.asarray(block_matching(jnp.asarray(left), jnp.asarray(right),
                                         max_disparity=32, window_radius=3))
        valid = disp >= 0
        interior = np.zeros_like(valid)
        interior[8:-8, 40:-8] = True
        sel = valid & interior
        assert valid[interior].mean() > 0.9
        assert (np.abs(disp[sel] - d_true) <= 1).mean() > 0.95

    def test_lr_check_kills_occlusion_noise(self, rng):
        left = rng.random((64, 128)).astype(np.float32)
        right = rng.random((64, 128)).astype(np.float32)  # unrelated images
        disp = np.asarray(block_matching(jnp.asarray(left), jnp.asarray(right),
                                         max_disparity=32))
        assert (disp < 0).mean() > 0.5   # mostly invalidated

    def test_disparity_to_cloud(self):
        disp = jnp.full((10, 20), 5.0)
        c = disparity_to_cloud(disp, focal=100.0, baseline=0.1)
        xyz, _ = to_numpy(c)
        np.testing.assert_allclose(xyz[:, 2], 2.0, atol=1e-5)  # z = 100*0.1/5
        assert c.width == 20 and c.height == 10
