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

__all__ = [
    "Correspondences",
    "determine_correspondences",
    "determine_reciprocal_correspondences",
    "correspondence_normal_shooting",
    "estimate_svd",
    "estimate_point_to_plane",
    "estimate_symmetric_point_to_plane",
    "point_to_plane_system",
    "ICPResult",
    "icp",
    "align",
    "fitness_score",
]
