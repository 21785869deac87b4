"""Multi-device parallel layer: meshes, sharded clouds, sharded ICP/TSDF,
multi-host runtime.

Lazy re-exports (PEP 562): ``pcl_tpu.parallel.runtime`` must stay
importable BEFORE ``jax.distributed.initialize`` runs, and the sibling
modules create jnp constants at import time (which initializes the XLA
backend — fatal for a multi-process worker that hasn't called
initialize_multihost yet)."""

_LAZY = {
    "make_mesh": "pcl_tpu.parallel.mesh",
    "shard_cloud": "pcl_tpu.parallel.mesh",
    "sharded_icp_step": "pcl_tpu.parallel.icp_sharded",
    "sharded_icp": "pcl_tpu.parallel.icp_sharded",
    "sharded_gicp": "pcl_tpu.parallel.gicp_sharded",
    "sharded_ndt": "pcl_tpu.parallel.ndt_sharded",
    "sharded_lum": "pcl_tpu.parallel.graph_sharded",
}

__all__ = ["make_mesh", "shard_cloud", "sharded_icp_step", "sharded_icp",
           "sharded_gicp", "sharded_ndt", "sharded_lum"]


def __getattr__(name):
    if name in _LAZY:
        import importlib
        mod = importlib.import_module(_LAZY[name])
        return getattr(mod, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
