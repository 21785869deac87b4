"""2D image ops — TPU-native equivalent of the reference header-only ``2d/``
module (SURVEY §2.13): convolution, edge detection, morphology over [H,W]
(or [H,W,C]) arrays, built on lax.conv / reduce_window so XLA fuses them.
"""

from pcl_tpu.image.ops import (
    convolve2d,
    gaussian_kernel,
    gaussian_blur,
    sobel,
    prewitt,
    erode,
    dilate,
    canny,
    canny_from_gradients,
)
from pcl_tpu.image.extractors import (
    extract_normal_image,
    extract_rgb_image,
    extract_label_image,
    extract_z_image,
    extract_curvature_image,
    extract_intensity_image,
    bearing_angle_image,
)
