"""Feature estimation — TPU-native equivalents of the reference ``features/``
module (reference: features/include/pcl/features/feature.h:106). PCL's
``Feature`` objects loop per point over a search tree; here every descriptor
is a pure batched function: gather fixed-k neighborhoods once, then compute
all descriptors as masked einsum/histogram reductions.
"""

from pcl_tpu.features.normals import estimate_normals, flip_normals_towards_viewpoint
from pcl_tpu.features.fpfh import estimate_fpfh, estimate_pfh
