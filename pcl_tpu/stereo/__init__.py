"""Stereo matching — TPU-native equivalent of the reference ``stereo/``
module (SURVEY §2.13): block matching + semi-global-style aggregation and
disparity-to-cloud conversion, as batched window reductions.
"""

from pcl_tpu.stereo.matching import (
    block_matching,
    disparity_to_cloud,
)
from pcl_tpu.stereo.advanced import (
    adaptive_cost_so_matching,
    disparity_to_dem,
)
