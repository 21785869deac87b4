"""pcl_tpu — a TPU-native point-cloud processing, registration and mapping framework.

A from-scratch re-design of the capability surface of the Point Cloud Library
(PCL, reference: PointCloudLibrary/pcl) for TPU hardware:

- Point clouds are fixed-size padded JAX pytrees (``pcl_tpu.core.Cloud``)
  instead of ``pcl::PointCloud<PointT>`` (reference:
  common/include/pcl/point_cloud.h:173).
- Neighbor search is batched, masked and compiled (brute-force MXU kernels and
  voxel hash grids) instead of pointer-chasing FLANN k-d trees (reference:
  kdtree/include/pcl/kdtree/kdtree_flann.h:132).
- Registration loops (ICP/GICP/NDT) run fully on device under
  ``jax.lax.while_loop`` (reference: registration/impl/icp.hpp:164-239).
- Multi-chip scaling uses ``jax.sharding.Mesh`` + collectives, not threads.
"""

import jax as _jax

# Geometry is f32-exact in the reference (PCL computes in float32, with f64
# accumulation only in NDT/GICP — SURVEY §7 "Numerics"). TPUs default matmuls
# to bf16 passes, which costs ~3 decimal digits on covariance/Umeyama
# reductions (0.02 absolute error on a unit-scale cross-covariance was
# measured). Small-K (K=3..8) contractions dominate this framework, so full
# f32 precision is the correct default; perf-critical kernels opt into lower
# precision explicitly.
_jax.config.update("jax_default_matmul_precision", "highest")

from pcl_tpu.version import __version__

from pcl_tpu.core.cloud import Cloud, make_cloud, from_numpy, to_numpy
from pcl_tpu.core import transforms, geometry

__all__ = [
    "__version__",
    "Cloud",
    "make_cloud",
    "from_numpy",
    "to_numpy",
    "transforms",
    "geometry",
]
