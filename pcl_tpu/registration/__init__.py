from pcl_tpu.registration.correspondence import (
    Correspondences,
    determine_correspondences,
    determine_reciprocal_correspondences,
    correspondence_normal_shooting,
)
from pcl_tpu.registration.estimation import (
    estimate_svd,
    estimate_point_to_plane,
    estimate_symmetric_point_to_plane,
    point_to_plane_system,
)
from pcl_tpu.registration.icp import ICPResult, icp, align, fitness_score
from pcl_tpu.registration.ndt import NDTResult, ndt, build_grid
from pcl_tpu.registration.ndt2d import NDT2DResult, ndt_2d, build_grid_2d
from pcl_tpu.registration.gicp import GICPResult, gicp, regularized_covariances
from pcl_tpu.registration.ia import (
    IAResult, sac_ia, prerejective_ransac, feature_knn,
)
from pcl_tpu.registration.graph import (
    PoseGraphResult, lum, elch_distribute, build_edges_from_correspondences,
)
from pcl_tpu.registration.incremental import IncrementalRegistration, MetaRegistration
from pcl_tpu.registration.trajectory import (
    ATEResult, RPEResult, trajectory_ate, trajectory_rpe,
    odometry_sequence, make_drift_sequence, umeyama_se3,
)

__all__ = [
    "Correspondences",
    "determine_correspondences",
    "determine_reciprocal_correspondences",
    "correspondence_normal_shooting",
    "estimate_svd",
    "estimate_point_to_plane",
    "estimate_symmetric_point_to_plane",
    "point_to_plane_system",
    "ICPResult", "icp", "align", "fitness_score",
    "NDTResult", "ndt", "build_grid",
    "NDT2DResult", "ndt_2d", "build_grid_2d",
    "GICPResult", "gicp", "regularized_covariances",
    "IAResult", "sac_ia", "prerejective_ransac", "feature_knn",
    "PoseGraphResult", "lum", "elch_distribute",
    "build_edges_from_correspondences",
    "IncrementalRegistration", "MetaRegistration",
    "ATEResult", "RPEResult", "trajectory_ate", "trajectory_rpe",
    "odometry_sequence", "make_drift_sequence", "umeyama_se3",
]

from pcl_tpu.registration.estimation import (
    estimate_dual_quaternion, estimate_2d, estimate_3point, estimate_lm,
    warp_rigid_6d, warp_rigid_3d, warp_translation,
)
from pcl_tpu.registration.fpcs import (fpcs_align, kfpcs_align,
                                        fpcs4_align, fpcs4_align_host)
from pcl_tpu.registration.variants import icp_nl, joint_icp
from pcl_tpu.registration.validation import ValidationResult, validate_euclidean
from pcl_tpu.registration.pyramid import (
    FeaturePyramid, build_pyramid, compare_pyramids,
)
from pcl_tpu.registration.ppf import PPFResult, ppf_register
from pcl_tpu.registration import rejection

__all__ += [
    "estimate_dual_quaternion", "estimate_2d", "estimate_3point", "estimate_lm",
    "warp_rigid_6d", "warp_rigid_3d", "warp_translation",
    "fpcs_align", "kfpcs_align", "fpcs4_align", "fpcs4_align_host",
    "icp_nl", "joint_icp",
    "ValidationResult", "validate_euclidean",
    "FeaturePyramid", "build_pyramid", "compare_pyramids",
    "PPFResult", "ppf_register", "rejection",
]
