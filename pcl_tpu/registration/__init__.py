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
from pcl_tpu.registration.gicp import GICPResult, gicp, regularized_covariances
from pcl_tpu.registration.ia import (
    IAResult, sac_ia, prerejective_ransac, feature_knn,
)
from pcl_tpu.registration.graph import (
    PoseGraphResult, lum, elch_distribute, build_edges_from_correspondences,
)
from pcl_tpu.registration.incremental import IncrementalRegistration, MetaRegistration

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
    "GICPResult", "gicp", "regularized_covariances",
    "IAResult", "sac_ia", "prerejective_ransac", "feature_knn",
    "PoseGraphResult", "lum", "elch_distribute",
    "build_edges_from_correspondences",
    "IncrementalRegistration", "MetaRegistration",
]
