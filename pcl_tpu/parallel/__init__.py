from pcl_tpu.parallel.mesh import make_mesh, shard_cloud
from pcl_tpu.parallel.icp_sharded import sharded_icp_step, sharded_icp

__all__ = ["make_mesh", "shard_cloud", "sharded_icp_step", "sharded_icp"]
