"""Surface processing — TPU-native equivalents of the reference ``surface/``
module (SURVEY §2.9): MLS smoothing/projection as batched weighted
polynomial fits.
"""

from pcl_tpu.surface.mls import moving_least_squares
