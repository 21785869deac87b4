"""Sample consensus — batched-hypothesis robust model fitting.

TPU-native re-design of the reference ``sample_consensus/`` module
(reference: sample_consensus/include/pcl/sample_consensus/sac.h:60,
ransac.hpp:57). PCL's estimators loop sequentially with adaptive iteration
counts; here ALL hypotheses are drawn, solved, and scored in one batch —
thousands of RANSAC iterations become a single [B, N] masked reduction that
rides the MXU/VPU, with the sequential adaptive-k loop replaced by a fixed
well-chosen B (SURVEY §7 "Hard parts").
"""

from pcl_tpu.sac.models import (
    SacModel,
    PlaneModel,
    LineModel,
    SphereModel,
    CircleModel3D,
    Circle2DModel,
    CylinderModel,
    ConeModel,
    TorusModel,
    Ellipse3DModel,
    StickModel,
    RegistrationModel,
    PerpendicularPlaneModel,
    ParallelPlaneModel,
    ParallelLineModel,
    NormalPlaneModel,
    NormalParallelPlaneModel,
    NormalSphereModel,
)
from pcl_tpu.sac.ransac import ransac, SacResult, Method
