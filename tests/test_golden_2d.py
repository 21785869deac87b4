"""2D image-op goldens on the reference's shipped lena ground truths.

Mirrors reference test/2d/test_2d.cpp: gray + binary morphology with a
3x3 rectangular element and Gaussian smoothing (kernel 3, sigma 1.0)
must reproduce the SHIPPED expected images (erosion/dilation/opening/
closing[_binary].pcd, gauss_smooth.pcd) within the reference's own
+/- 1 intensity tolerance over the interior.
"""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from conftest import reference_pcd
from pcl_tpu.io import pcd as pcd_io
from pcl_tpu.image import erode, dilate, gaussian_blur
from pcl_tpu.core.cloud import ATTR_INTENSITY


def _img(name):
    c = pcd_io.load(reference_pcd(os.path.join("2d", name)))
    h, w = c.height, c.width
    assert h > 1 and w > 1
    return np.asarray(c.attrs[ATTR_INTENSITY]).reshape(h, w)


@pytest.fixture(scope="module")
def lena():
    return _img("lena.pcd")


def _check_interior(ours, gt, tol=1.0):
    np.testing.assert_allclose(
        np.asarray(ours)[1:-1, 1:-1], gt[1:-1, 1:-1], atol=tol)


def test_erosion_gray(lena):
    _check_interior(erode(jnp.asarray(lena), 3), _img("erosion.pcd"))


def test_dilation_gray(lena):
    _check_interior(dilate(jnp.asarray(lena), 3), _img("dilation.pcd"))


def test_opening_gray(lena):
    out = dilate(erode(jnp.asarray(lena), 3), 3)
    _check_interior(out, _img("opening.pcd"))


def test_closing_gray(lena):
    out = erode(dilate(jnp.asarray(lena), 3), 3)
    _check_interior(out, _img("closing.pcd"))


def test_erosion_binary(lena):
    b = (lena > 100).astype(np.float32)
    gt = _img("erosion_binary.pcd") / 255.0
    _check_interior(erode(jnp.asarray(b), 3), gt)


def test_dilation_binary(lena):
    b = (lena > 100).astype(np.float32)
    gt = _img("dilation_binary.pcd") / 255.0
    _check_interior(dilate(jnp.asarray(b), 3), gt)


def test_opening_binary(lena):
    b = (lena > 100).astype(np.float32)
    gt = _img("opening_binary.pcd") / 255.0
    _check_interior(dilate(erode(jnp.asarray(b), 3), 3), gt)


def test_closing_binary(lena):
    b = (lena > 100).astype(np.float32)
    gt = _img("closing_binary.pcd") / 255.0
    _check_interior(erode(dilate(jnp.asarray(b), 3), 3), gt)


def test_gaussian_smooth(lena):
    out = gaussian_blur(jnp.asarray(lena), size=3, sigma=1.0)
    _check_interior(out, _img("gauss_smooth.pcd"))
