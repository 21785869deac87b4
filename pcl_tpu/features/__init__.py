"""Feature estimation — TPU-native equivalents of the reference ``features/``
module (reference: features/include/pcl/features/feature.h:106). PCL's
``Feature`` objects loop per point over a search tree; here every descriptor
is a pure batched function: gather fixed-k neighborhoods once, then compute
all descriptors as masked einsum/histogram reductions.
"""

from pcl_tpu.features.normals import estimate_normals, flip_normals_towards_viewpoint
from pcl_tpu.features.fpfh import estimate_fpfh, estimate_pfh
from pcl_tpu.features.shot import estimate_shot_interpolated, estimate_shot, estimate_shot_hard, estimate_shot_color, local_reference_frames
from pcl_tpu.features.global_desc import estimate_vfh, estimate_esf
from pcl_tpu.features.local_misc import spin_images_reference
from pcl_tpu.features.local_misc import (
    principal_curvatures,
    boundary_estimation,
    spin_images,
    difference_of_normals,
    moment_of_inertia,
    MomentsResult,
)
from pcl_tpu.features.local_misc import moment_invariants
from pcl_tpu.features.rsd import estimate_rsd, estimate_grsd, GRSD_BINS
from pcl_tpu.features.intensity import intensity_gradient, intensity_spin, rift
from pcl_tpu.features.cvfh import (
    estimate_cvfh, estimate_our_cvfh, estimate_crh, crh_align,
    ClusteredSignatures,
)
from pcl_tpu.features.gasd import estimate_gasd, estimate_gasd_color
from pcl_tpu.features.integral_normals import integral_image_normals
from pcl_tpu.features.shape_context import estimate_3dsc, estimate_usc
from pcl_tpu.features.rops import estimate_rops, estimate_rops_mesh
from pcl_tpu.features.organized_edge import (
    organized_edge_detection,
    edge_label_indices,
    EDGELABEL_NAN_BOUNDARY,
    EDGELABEL_OCCLUDING,
    EDGELABEL_OCCLUDED,
    EDGELABEL_HIGH_CURVATURE,
    EDGELABEL_RGB_CANNY,
)
from pcl_tpu.features.lrf import board_lrf, flare_lrf
from pcl_tpu.features.persistence import feature_persistence
from pcl_tpu.features.narf import (
    extract_borders, narf_interest_image, narf_keypoints, narf_descriptors,
    BorderDescription, BORDER_NONE, BORDER_OBSTACLE, BORDER_SHADOW,
)
from pcl_tpu.features.color_features import (
    estimate_pfhrgb,
    ppfrgb_features,
    estimate_cppf,
)
