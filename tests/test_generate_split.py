"""Cloud generators + pcl::split — mirrors reference
test/common/test_generator.cpp and test/io/test_split.cpp."""

import numpy as np
import jax

from pcl_tpu.utils import generate_cloud_uniform, generate_cloud_normal, split


def test_uniform_generator_ranges():
    # reference UniformCloudGenerator.PointXYZ: 480x640 organized, per-axis
    # ranges [0,1) x [-1,1) x [-2.5,1.5)
    c = generate_cloud_uniform(
        jax.random.PRNGKey(0), width=480, height=640,
        ranges=((0, 1), (-1, 1), (-2.5, 1.5)))
    assert c.width == 480 and c.height == 640
    assert c.capacity == 480 * 640
    x = np.asarray(c.xyz)
    assert (x[:, 0] >= 0).all() and (x[:, 0] < 1).all()
    assert (x[:, 1] >= -1).all() and (x[:, 1] < 1).all()
    assert (x[:, 2] >= -2.5).all() and (x[:, 2] < 1.5).all()


def test_normal_generator_moments():
    c = generate_cloud_normal(
        jax.random.PRNGKey(1), width=200, height=200,
        params=((2.0, 0.5), (-1.0, 2.0), (0.0, 1.0)))
    x = np.asarray(c.xyz)
    np.testing.assert_allclose(x.mean(0), [2.0, -1.0, 0.0], atol=0.05)
    np.testing.assert_allclose(x.std(0), [0.5, 2.0, 1.0], atol=0.05)


def test_split_reference_vectors():
    assert split("", " \r\t") == []
    assert split("\r\t ", " \r\t") == []
    assert split("abcd", " \r\t") == ["abcd"]
    expected = ["aabb", "ccdd", "eeff", "gghh", "iijj", "kkll", "mmnn",
                "oopp"]
    assert split("aabb ccdd\reeff\tgghh \riijj \tkkll\r\tmmnn \r\toopp",
                 " \r\t") == expected
    assert split("  aabb ccdd\reeff\tgghh \riijj \tkkll\r\tmmnn \r\toopp\t\t",
                 " \r\t") == expected
