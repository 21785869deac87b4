"""Dense depth fusion — the KinectFusion-equivalent pipeline.

TPU-native re-design of the reference ``gpu/kinfu`` / ``gpu/kinfu_large_scale``
(SURVEY §2.14, §3.5): TSDF volume integration, raycasting, and projective
point-to-plane ICP odometry, each a batched jit kernel over the full volume /
image instead of CUDA grid-stride loops.
"""

from pcl_tpu.fusion.tsdf import (
    TSDFVolume,
    make_volume,
    integrate,
    raycast,
    extract_surface_points,
    depth_to_vertex_map,
    vertex_map_normals,
)
from pcl_tpu.fusion.kinfu import KinfuState, kinfu_init, kinfu_step, kinfu_reset
from pcl_tpu.fusion.world_model import WorldModel, save_tsdf, load_tsdf
