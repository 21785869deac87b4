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
