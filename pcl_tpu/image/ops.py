"""Batched 2D image primitives (reference: 2d/include/pcl/2d/convolution.h,
edge.h, morphology.h — pcl::Convolution, pcl::Edge Sobel/Prewitt/Canny,
pcl::Morphology)."""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp


def _conv(img: jax.Array, kernel: jax.Array, padding: str = "SAME") -> jax.Array:
    """[H,W] (x) [kh,kw] correlation with mirror-free zero padding."""
    return jax.lax.conv_general_dilated(
        img[None, None, :, :],
        kernel[None, None, :, :],
        window_strides=(1, 1),
        padding=padding,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )[0, 0]


def convolve2d(img: jax.Array, kernel: jax.Array) -> jax.Array:
    """2D correlation (pcl::Convolution semantics: same-size output)."""
    return _conv(img.astype(jnp.float32), kernel.astype(jnp.float32))


def gaussian_kernel(size: int, sigma: float) -> jax.Array:
    """[size,size] normalized Gaussian (reference:
    convolution kernels / common/include/pcl/common/gaussian.h)."""
    r = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-(r**2) / (2.0 * sigma * sigma))
    k = jnp.outer(g, g)
    return k / jnp.sum(k)


def gaussian_blur(img: jax.Array, size: int = 5, sigma: float = 1.0) -> jax.Array:
    return convolve2d(img, gaussian_kernel(size, sigma))


_SOBEL_X = jnp.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], jnp.float32)
_PREWITT_X = jnp.array([[-1, 0, 1], [-1, 0, 1], [-1, 0, 1]], jnp.float32)


def sobel(img: jax.Array) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """(gx, gy, magnitude) via Sobel (reference edge.h detectEdgeSobel)."""
    gx = _conv(img, _SOBEL_X)
    gy = _conv(img, _SOBEL_X.T)
    return gx, gy, jnp.sqrt(gx * gx + gy * gy)


def prewitt(img: jax.Array) -> Tuple[jax.Array, jax.Array, jax.Array]:
    gx = _conv(img, _PREWITT_X)
    gy = _conv(img, _PREWITT_X.T)
    return gx, gy, jnp.sqrt(gx * gx + gy * gy)


def _window(img, op, init, size):
    return jax.lax.reduce_window(
        img, init, op, (size, size), (1, 1), "SAME"
    )


def erode(img: jax.Array, size: int = 3) -> jax.Array:
    """Grayscale erosion (reference morphology.h erosionGray)."""
    return _window(img, jax.lax.min, jnp.inf, size)


def dilate(img: jax.Array, size: int = 3) -> jax.Array:
    return _window(img, jax.lax.max, -jnp.inf, size)


@partial(jax.jit, static_argnames=("size",))
def canny(
    img: jax.Array,
    low: float,
    high: float,
    size: int = 5,
    sigma: float = 1.4,
) -> jax.Array:
    """Canny edges (reference edge.h detectEdgeCanny): blur -> Sobel ->
    non-max suppression along the quantized gradient direction ->
    hysteresis via iterated dilation of the strong set over the weak set."""
    sm = gaussian_blur(img.astype(jnp.float32), size, sigma)
    gx, gy, _ = sobel(sm)
    return canny_from_gradients(gx, gy, low, high)


def canny_from_gradients(
    gx: jax.Array,
    gy: jax.Array,
    low: float,
    high: float,
) -> jax.Array:
    """Canny NMS + hysteresis over CALLER-SUPPLIED gradient images (the
    reference pcl::Edge::canny(input_x, input_y, ...) entry point used by
    OrganizedEdgeFromNormals, which feeds the normal-component images as
    gradients)."""
    mag = jnp.sqrt(gx * gx + gy * gy)
    ang = jnp.arctan2(gy, gx)                  # [-pi, pi]
    # quantize direction to 0/45/90/135
    a = jnp.mod(jnp.round(ang / (jnp.pi / 4.0)), 4).astype(jnp.int32)

    def shift(m, dy, dx):
        return jnp.roll(jnp.roll(m, dy, axis=0), dx, axis=1)

    n0 = jnp.maximum(shift(mag, 0, 1), shift(mag, 0, -1))     # horizontal grad
    n1 = jnp.maximum(shift(mag, 1, 1), shift(mag, -1, -1))    # 45
    n2 = jnp.maximum(shift(mag, 1, 0), shift(mag, -1, 0))     # vertical grad
    n3 = jnp.maximum(shift(mag, 1, -1), shift(mag, -1, 1))    # 135
    neigh = jnp.select([a == 0, a == 1, a == 2, a == 3], [n0, n1, n2, n3])
    nms = jnp.where(mag >= neigh, mag, 0.0)

    strong = nms >= high
    weak = nms >= low

    def body(state):
        s, changed, it = state
        grown = (dilate(s.astype(jnp.float32), 3) > 0) & weak
        return grown, jnp.any(grown != s), it + 1

    def cond(state):
        return state[1] & (state[2] < 64)

    edges, _, _ = jax.lax.while_loop(cond, body, (strong, True, jnp.int32(0)))
    return edges
