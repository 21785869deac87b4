"""Spring (organized border expansion), image extractors, bearing-angle
image — mirrors reference test/common/test_spring.cpp,
test/io/test_point_cloud_image_extractors.cpp and
test/common/test_bearing_angle_image.cpp expectations.
"""

import numpy as np
import jax.numpy as jnp

from pcl_tpu.core.cloud import (
    make_cloud, ATTR_NORMAL, ATTR_RGB, ATTR_LABEL, ATTR_INTENSITY,
)
from pcl_tpu.core import spring
from pcl_tpu.image import (
    extract_normal_image,
    extract_rgb_image,
    extract_label_image,
    extract_z_image,
    extract_intensity_image,
    bearing_angle_image,
)


def _organized(h, w, seed=0):
    rng = np.random.default_rng(seed)
    xyz = rng.uniform(-1, 1, (h, w, 3)).astype(np.float32)
    return make_cloud(jnp.asarray(xyz.reshape(-1, 3)), width=w, height=h), xyz


class TestSpring:
    def test_duplicate_rows(self):
        c, xyz = _organized(4, 5)
        out = spring.duplicate_rows(c, 2)
        assert out.height == 8 and out.width == 5
        g = np.asarray(out.xyz).reshape(8, 5, 3)
        np.testing.assert_array_equal(g[0], g[1])
        np.testing.assert_array_equal(g[0], g[2])
        np.testing.assert_array_equal(g[-1], g[-2])

    def test_mirror_columns(self):
        c, xyz = _organized(3, 6)
        out = spring.mirror_columns(c, 2)
        assert out.width == 10
        g = np.asarray(out.xyz).reshape(3, 10, 3)
        np.testing.assert_array_equal(g[:, 1], g[:, 2])   # mirror of col 0
        np.testing.assert_array_equal(g[:, 0], g[:, 3])   # mirror of col 1

    def test_expand_and_delete_roundtrip(self):
        c, xyz = _organized(4, 4)
        fill = np.float32([9.0, 9.0, 9.0])
        out = spring.expand_rows(c, fill, 1)
        assert out.height == 6
        g = np.asarray(out.xyz).reshape(6, 4, 3)
        assert (g[0] == 9.0).all() and (g[-1] == 9.0).all()
        back = spring.delete_rows(out, 1)
        np.testing.assert_array_equal(
            np.asarray(back.xyz).reshape(4, 4, 3), xyz)
        out2 = spring.expand_columns(c, fill, 2)
        assert out2.width == 8
        back2 = spring.delete_cols(out2, 2)
        np.testing.assert_array_equal(
            np.asarray(back2.xyz).reshape(4, 4, 3), xyz)


class TestExtractors:
    def test_normal_field(self):
        c, _ = _organized(2, 2)
        n = np.tile(np.float32([-1.0, 0.0, 1.0]), (4, 1))
        c = c.with_attrs(**{ATTR_NORMAL: jnp.asarray(n)})
        img = extract_normal_image(c)
        assert img.shape == (2, 2, 3)
        assert (img[..., 0] == 0).all()
        assert (img[..., 1] == 127).all()
        assert (img[..., 2] == 254).all()

    def test_rgb_field(self):
        c, _ = _organized(2, 2)
        rgb = np.tile(np.float32([0, 127, 254]) / 255.0, (4, 1))
        c = c.with_attrs(**{ATTR_RGB: jnp.asarray(rgb)})
        img = extract_rgb_image(c)
        assert (img[..., 0] == 0).all()
        assert (img[..., 1] == 127).all()
        assert (img[..., 2] == 254).all()

    def test_label_mono(self):
        c, _ = _organized(2, 2)
        c = c.with_attrs(**{ATTR_LABEL: jnp.arange(4, dtype=jnp.int32)})
        img = extract_label_image(c, "mono")
        assert img.dtype == np.uint16
        np.testing.assert_array_equal(img.reshape(-1), [0, 1, 2, 3])

    def test_label_rgb_random_consistent(self):
        c, _ = _organized(2, 2)
        c = c.with_attrs(**{ATTR_LABEL: jnp.asarray([0, 1, 0, 1], jnp.int32)})
        img = extract_label_image(c, "rgb_random").reshape(4, 3)
        np.testing.assert_array_equal(img[0], img[2])
        np.testing.assert_array_equal(img[1], img[3])
        assert (img[0] != img[1]).any()

    def test_label_palette_stable_across_label_values(self):
        c, _ = _organized(2, 2)
        c1 = c.with_attrs(**{ATTR_LABEL: jnp.asarray([0, 1, 0, 1], jnp.int32)})
        c2 = c.with_attrs(**{ATTR_LABEL: jnp.asarray([10, 11, 10, 11], jnp.int32)})
        i1 = extract_label_image(c1, "rgb_glasbey")
        i2 = extract_label_image(c2, "rgb_glasbey")
        np.testing.assert_array_equal(i1, i2)

    def test_z_field_fixed_factor(self):
        h = w = 2
        xyz = np.zeros((4, 3), np.float32)
        xyz[:, 2] = 1.0 + np.arange(4)
        c = make_cloud(jnp.asarray(xyz), width=w, height=h)
        img = extract_z_image(c)
        np.testing.assert_array_equal(
            img.reshape(-1), (10000 * (np.arange(4) + 1)).astype(np.uint16))

    def test_intensity_unscaled(self):
        c, _ = _organized(2, 2)
        c = c.with_attrs(**{ATTR_INTENSITY: jnp.asarray([1.0, 2.0, 3.0, 4.0])})
        img = extract_intensity_image(c)
        np.testing.assert_array_equal(img.reshape(-1), [1, 2, 3, 4])


class TestBearingAngle:
    def test_generate_ba_image(self):
        # reference test_bearing_angle_image.cpp: 3x2 cloud, exact grays
        pts = np.float32([
            [3.0, 1.5, -2.0], [1.0, 3.0, 2.0], [2.0, 3.0, 2.0],
            [2.0, 3.0, 1.0], [4.0, 2.0, 2.0], [-1.5, 3.0, 1.0],
        ])
        c = make_cloud(jnp.asarray(pts), width=3, height=2)
        img = bearing_angle_image(c)
        np.testing.assert_array_equal(
            img.reshape(-1), [0, 0, 0, 112, 80, 0])


class TestCopyMakeBorder:
    def test_constant(self):
        from pcl_tpu.core.spring import copy_make_border
        c, xyz = _organized(3, 4)
        fill = np.float32([7, 7, 7])
        out = copy_make_border(c, 1, 2, 3, 1, "constant", fill)
        assert out.height == 6 and out.width == 8
        g = np.asarray(out.xyz).reshape(6, 8, 3)
        np.testing.assert_array_equal(g[1:4, 3:7], xyz)
        assert (g[0] == 7).all() and (g[4:] == 7).all()
        assert (g[:, :3][1:4] == 7).all() and (g[:, 7:][1:4] == 7).all()

    def test_replicate_and_reflect(self):
        from pcl_tpu.core.spring import copy_make_border
        c, xyz = _organized(3, 4, seed=2)
        rep = copy_make_border(c, 1, 0, 0, 2, "replicate")
        g = np.asarray(rep.xyz).reshape(4, 6, 3)
        np.testing.assert_array_equal(g[0, :4], xyz[0])      # top replicated
        np.testing.assert_array_equal(g[1:, 4], g[1:, 3])    # right edge
        ref = copy_make_border(c, 0, 2, 1, 0, "reflect")
        g2 = np.asarray(ref.xyz).reshape(5, 5, 3)
        np.testing.assert_array_equal(g2[:3, 0], xyz[:, 0])  # mirror col 0
        np.testing.assert_array_equal(g2[3, 1:], xyz[2])     # mirror row H-1
