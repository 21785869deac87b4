"""Device mesh and cloud sharding helpers.

The reference has no distributed runtime (SURVEY §2.15) — its parallelism is
OpenMP threads over points. The TPU-native equivalent: shard the point axis
of padded cloud tensors across a 1-D ``jax.sharding.Mesh`` ("points" axis,
the data-parallel analog), keep small state (transforms, 6x6 systems)
replicated, and reduce with psum over ICI.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pcl_tpu.core.cloud import Cloud

POINTS_AXIS = "points"


def make_mesh(n_devices: Optional[int] = None, axis: str = POINTS_AXIS) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def shard_cloud(cloud: Cloud, mesh: Mesh, axis: str = POINTS_AXIS) -> Cloud:
    """Place a cloud with its point axis sharded across the mesh. Capacity
    must divide evenly by the axis size (pad_to first if needed)."""
    n = mesh.shape[axis]
    cap = cloud.capacity
    if cap % n:
        cloud = cloud.pad_to(cap + (-cap) % n)
    row = NamedSharding(mesh, P(axis))
    return jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P(axis, *([None] * (x.ndim - 1))))),
        cloud,
    )


def replicate(tree, mesh: Mesh):
    return jax.tree.map(lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree)
