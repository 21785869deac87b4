"""RangeImage + 2D image op tests."""

import numpy as np
import jax.numpy as jnp

from pcl_tpu.core.cloud import make_cloud, to_numpy
from pcl_tpu.core import range_image as ri
from pcl_tpu import image as im


class TestRangeImage:
    def test_project_unproject_roundtrip(self, rng):
        # points on a sphere shell in front of the sensor
        d = rng.normal(size=(500, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        d = d[d[:, 2] > 0.3]                      # forward cone
        pts = d * rng.uniform(1.0, 3.0, size=(len(d), 1)).astype(np.float32)
        c = make_cloud(jnp.asarray(pts))
        img = ri.create_from_cloud(c, angular_resolution=np.pi / 360, width=720, height=360)
        back = ri.to_cloud(img)
        xyz, _ = to_numpy(back)
        assert len(xyz) > 0.8 * len(pts)
        # unprojected pixels lie near original surface: range error < 2% + binning
        r_orig = np.linalg.norm(pts, axis=1)
        r_back = np.linalg.norm(xyz, axis=1)
        assert r_back.min() > r_orig.min() - 0.1
        assert r_back.max() < r_orig.max() + 0.1

    def test_zbuffer_keeps_nearest(self):
        pts = np.array([[0, 0, 1.0], [0, 0, 2.0]], np.float32)  # same ray
        c = make_cloud(jnp.asarray(pts))
        img = ri.create_from_cloud(c, angular_resolution=np.pi / 36, width=72, height=36)
        r = np.asarray(img.ranges)
        observed = r[np.isfinite(r)]
        assert len(observed) == 1 and abs(observed[0] - 1.0) < 1e-5

    def test_planar(self, rng):
        pts = np.stack([
            rng.uniform(-0.5, 0.5, 200), rng.uniform(-0.5, 0.5, 200),
            rng.uniform(1.0, 2.0, 200)
        ], 1).astype(np.float32)
        c = make_cloud(jnp.asarray(pts))
        img = ri.create_planar_from_cloud(c, focal_length=100.0, width=160, height=120)
        assert np.isfinite(np.asarray(img.ranges)).sum() > 100
        back = ri.to_cloud(img)
        xyz, _ = to_numpy(back)
        assert (np.abs(xyz[:, 2] - 1.5) < 0.6).all()


class TestImageOps:
    def test_gaussian_blur_preserves_mean(self, rng):
        img = jnp.asarray(rng.random((32, 64)).astype(np.float32))
        out = im.gaussian_blur(img, 5, 1.0)
        assert abs(float(out.mean()) - float(img.mean())) < 0.02

    def test_sobel_on_step(self):
        img = jnp.concatenate([jnp.zeros((16, 16)), jnp.ones((16, 16))], axis=1)
        gx, gy, mag = im.sobel(img)
        m = np.asarray(mag)
        assert m[:, 14:18].max() > 1.0
        assert m[:, :12].max() < 1e-6

    def test_morphology(self):
        img = jnp.zeros((11, 11)).at[5, 5].set(1.0)
        d = im.dilate(img, 3)
        assert float(d.sum()) == 9.0
        e = im.erode(d, 3)
        assert float(e.sum()) == 1.0 and float(e[5, 5]) == 1.0

    def test_canny_finds_square(self):
        img = jnp.zeros((40, 40)).at[10:30, 10:30].set(1.0)
        edges = np.asarray(im.canny(img, low=0.2, high=0.8))
        assert edges.any()
        # interior is not edge
        assert not edges[15:25, 15:25].any()
