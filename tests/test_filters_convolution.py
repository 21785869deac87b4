"""Filter tests — convolution 3D/rows/cols, pyramid, fast bilateral,
covariance sampling, sampling-surface-normal; console utilities."""

import numpy as np
import jax.numpy as jnp

from pcl_tpu.core.cloud import make_cloud, ATTR_NORMAL
from pcl_tpu.filters import (
    convolution_3d,
    convolution_rows,
    convolution_cols,
    pyramid,
    fast_bilateral,
    covariance_sampling,
    sampling_surface_normal,
)
from pcl_tpu.utils import (
    parse_argument,
    parse_x_arguments,
    find_switch,
    parse_file_extension_argument,
    TimeTrigger,
    Synchronizer,
    gaussian_kernel_1d,
    fit_polynomial,
    eval_polynomial,
)


class TestConvolution3D:
    def test_denoise_plane(self, rng):
        u = rng.uniform(-1, 1, (500, 2)).astype(np.float32)
        z = rng.normal(scale=0.02, size=500).astype(np.float32)
        pts = np.stack([u[:, 0], u[:, 1], z], 1)
        c = make_cloud(jnp.asarray(pts))
        out = convolution_3d(c, radius=0.3)
        assert np.asarray(out.xyz)[:, 2].std() < z.std() * 0.6


class TestConvolutionImage:
    def test_rows_impulse(self):
        img = np.zeros((5, 9), np.float32)
        img[2, 4] = 1.0
        k = jnp.asarray([0.25, 0.5, 0.25])
        out = np.asarray(convolution_rows(jnp.asarray(img), k))
        np.testing.assert_allclose(out[2, 3:6], [0.25, 0.5, 0.25])
        assert out[1].sum() == 0

    def test_cols_impulse(self):
        img = np.zeros((9, 5), np.float32)
        img[4, 2] = 1.0
        k = jnp.asarray([0.25, 0.5, 0.25])
        out = np.asarray(convolution_cols(jnp.asarray(img), k))
        np.testing.assert_allclose(out[3:6, 2], [0.25, 0.5, 0.25])


class TestPyramid:
    def test_levels(self, rng):
        H, W = 32, 48
        xyz = rng.normal(size=(H, W, 3)).astype(np.float32)
        levels = pyramid(xyz, np.ones((H, W), bool), levels=3)
        assert len(levels) == 3
        assert levels[1][0].shape == (16, 24, 3)
        assert levels[2][0].shape == (8, 12, 3)
        assert levels[2][1].all()


class TestFastBilateral:
    def test_edge_preserving_smooth(self, rng):
        H, W = 48, 48
        depth = np.full((H, W), 1.0, np.float32)
        depth[:, 24:] = 2.0
        noisy = depth + rng.normal(scale=0.01, size=(H, W)).astype(np.float32)
        out = np.asarray(fast_bilateral(jnp.asarray(noisy), sigma_s=6.0,
                                        sigma_r=0.05))
        # noise reduced
        assert np.abs(out[:, :20] - 1.0).std() < np.abs(noisy[:, :20] - 1.0).std()
        # step preserved
        assert abs(out[24, 10] - 1.0) < 0.05
        assert abs(out[24, 40] - 2.0) < 0.05


class TestCovarianceSampling:
    def test_prefers_constraining_points(self, rng):
        # big flat plane + small bump patch: bump normals constrain the
        # weak rotational/translational directions -> oversampled
        n = 400
        plane = np.concatenate(
            [rng.uniform(-1, 1, (n, 2)), np.zeros((n, 1))], 1
        ).astype(np.float32)
        nrm_p = np.tile([0, 0, 1.0], (n, 1)).astype(np.float32)
        m = 40
        wall = np.concatenate(
            [np.zeros((m, 1)), rng.uniform(-0.2, 0.2, (m, 1)),
             rng.uniform(0, 0.4, (m, 1))], 1
        ).astype(np.float32)
        nrm_w = np.tile([1.0, 0, 0], (m, 1)).astype(np.float32)
        c = make_cloud(jnp.asarray(np.concatenate([plane, wall]))).with_attrs(
            normal=jnp.asarray(np.concatenate([nrm_p, nrm_w]))
        )
        keep = covariance_sampling(c, n_samples=60)
        frac_wall = (keep >= n).mean()
        assert frac_wall > 0.3  # walls are 9% of points but heavily selected


class TestSamplingSurfaceNormal:
    def test_cell_normals(self, rng):
        pts = np.concatenate(
            [rng.uniform(0, 1, (300, 2)), np.zeros((300, 1))], 1
        ).astype(np.float32)
        c = make_cloud(jnp.asarray(pts))
        out = sampling_surface_normal(c, cell_size=0.25, samples_per_cell=3)
        m = np.asarray(out.mask)
        assert m.sum() <= 16 * 3 and m.sum() > 10
        n = np.asarray(out.attrs[ATTR_NORMAL])[m]
        assert (np.abs(n[:, 2]) > 0.99).all()


class TestConsole:
    def test_parse(self):
        argv = ["prog", "-r", "0.5", "--xyz", "1,2,3", "-v", "a.pcd", "b.ply"]
        assert parse_argument(argv, "-r", float) == 0.5
        assert parse_x_arguments(argv, "--xyz", 3) == [1.0, 2.0, 3.0]
        assert find_switch(argv, "-v")
        assert not find_switch(argv, "-q")
        assert parse_file_extension_argument(argv, ".pcd") == [6]

    def test_time_trigger(self):
        import time
        hits = []
        t = TimeTrigger(0.02, lambda: hits.append(1))
        t.start()
        time.sleep(0.15)
        t.stop()
        assert 3 <= len(hits) <= 10

    def test_synchronizer(self):
        pairs = []
        s = Synchronizer()
        s.register_callback(lambda a, b, t0, t1: pairs.append((a, b)))
        s.add0("d0", 0.0)
        assert not pairs
        s.add1("i0", 0.1)
        assert pairs == [("d0", "i0")]

    def test_gaussian_polynomial(self):
        g = gaussian_kernel_1d(1.0, size=7)
        assert abs(g.sum() - 1.0) < 1e-12 and g[3] == g.max()
        x = np.linspace(-1, 1, 50)
        y = 2 - x + 3 * x**2
        coef = fit_polynomial(x, y, order=2)
        np.testing.assert_allclose(coef, [2, -1, 3], atol=1e-8)
        np.testing.assert_allclose(eval_polynomial(coef, x), y, atol=1e-8)
