"""Surface processing — TPU-native equivalents of the reference ``surface/``
module (SURVEY §2.9): MLS smoothing/projection as batched weighted
polynomial fits.
"""

from pcl_tpu.surface.mls import moving_least_squares
from pcl_tpu.surface.reconstruction import (
    hoppe_signed_distance,
    surface_nets,
    reconstruct_hoppe,
    organized_fast_mesh,
)
from pcl_tpu.surface.hulls import convex_hull, concave_hull
