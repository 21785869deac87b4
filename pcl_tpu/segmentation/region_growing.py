"""Region growing segmentation — smoothness-constrained components.

Re-design of pcl::RegionGrowing (reference: segmentation/include/pcl/
segmentation/region_growing.h:60). PCL grows regions sequentially from
lowest-curvature seeds, admitting a neighbor when the angle between its
normal and the SEED REGION's normal is below a threshold, and letting it
spawn further growth only if its curvature is also below a threshold.

TPU form: the same smoothness relation as a symmetric graph —
edge (i,j) iff j is a k-neighbor of i AND angle(n_i, n_j) <= theta — with
growth gated through low-curvature points only (high-curvature points may
join a region but not propagate it, matching the reference's
curvature-threshold semantics). Connected components via label propagation.
Order-dependence of PCL's seeded growth is replaced by a deterministic
fixed point (a documented re-design, not a bug-for-bug port).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from pcl_tpu.core.cloud import Cloud, ATTR_NORMAL, ATTR_CURVATURE
from pcl_tpu.search import bruteforce
from pcl_tpu.segmentation.clustering import _compact_labels, labels_to_cluster_sizes


@partial(jax.jit, static_argnames=("k", "min_cluster_size", "max_cluster_size",
                                   "max_sweeps"))
def region_growing(
    cloud: Cloud,
    smoothness_threshold: float = 0.523,   # 30 deg, reference default ~30/180*pi
    curvature_threshold: float = 0.05,     # reference default (region_growing.h)
    k: int = 30,
    min_cluster_size: int = 1,
    max_cluster_size: int = 1 << 30,
    max_sweeps: int = 64,
) -> Tuple[jax.Array, jax.Array]:
    """Smoothness-based segmentation. Cloud must carry normals + curvature.

    Returns (labels [N] int32, n_clusters) like euclidean_clusters.
    """
    if ATTR_NORMAL not in cloud.attrs:
        raise ValueError("region_growing requires normals")
    normals = cloud.attrs[ATTR_NORMAL]
    curv = cloud.attrs.get(ATTR_CURVATURE)
    if curv is None:
        curv = jnp.zeros((cloud.capacity,), jnp.float32)

    n = cloud.capacity
    idx, d2, valid = bruteforce.knn(cloud.xyz, cloud.mask, cloud.xyz, k)
    idxc = jnp.clip(idx, 0, n - 1)
    valid = valid & cloud.mask[:, None]

    cos_thr = jnp.cos(jnp.float32(smoothness_threshold))
    nbr_n = normals[idxc]                                    # [N,k,3]
    cosang = jnp.abs(jnp.einsum("ni,nki->nk", normals, nbr_n))
    smooth = cosang >= cos_thr

    # growth passes only THROUGH low-curvature points: edge i->j usable when
    # the endpoint it propagates from has curvature below the threshold
    low_i = (curv <= curvature_threshold)[:, None]
    edge = valid & smooth & low_i                            # i can push to j
    labels0 = jnp.where(cloud.mask, jnp.arange(n, dtype=jnp.int32), jnp.int32(n))
    big = jnp.int32(n)

    def body(state):
        labels, _changed, sweep = state
        # push: min over neighbors j of labels[j] where edge j->i exists ==
        # scatter-min; realized as gather with the transpose convention
        # (edge is built per-source row, so propagate i's label to its
        # neighbors via segment_min over flattened targets)
        flat_to = idxc.reshape(-1)
        flat_lab = jnp.repeat(labels, k)
        flat_ok = edge.reshape(-1)
        pushed = jax.ops.segment_min(
            jnp.where(flat_ok, flat_lab, big), flat_to, num_segments=n
        )
        # pull: i adopts min label among its own low-curvature neighbors
        nbr_lab = jnp.where(edge, labels[idxc], big)
        pulled = jnp.min(nbr_lab, axis=1)
        new = jnp.minimum(labels, jnp.minimum(pushed, pulled))
        new = jnp.where(cloud.mask, new, big)
        rep = new[jnp.clip(new, 0, n - 1)]
        new = jnp.where(cloud.mask, jnp.minimum(new, rep), big)
        return new, jnp.any(new != labels), sweep + 1

    def cond(state):
        return state[1] & (state[2] < max_sweeps)

    labels, _, _ = jax.lax.while_loop(cond, body, (labels0, True, jnp.int32(0)))
    dense, n_clusters = _compact_labels(labels, cloud.mask)
    sizes = labels_to_cluster_sizes(dense, n)
    csize = jnp.where(dense >= 0, sizes[jnp.clip(dense, 0, n - 1)], 0)
    keep = (csize >= min_cluster_size) & (csize <= max_cluster_size)
    return jnp.where(keep, dense, -1), n_clusters
