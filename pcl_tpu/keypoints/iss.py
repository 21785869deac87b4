"""ISS3D keypoints — intrinsic shape signatures.

Re-design of pcl::ISSKeypoint3D (reference: keypoints/include/pcl/keypoints/
iss_3d.h:85, impl/iss_3d.hpp). Per point: scatter matrix over the
salient-radius neighborhood; eigenvalues l1 >= l2 >= l3; a point is a
candidate iff l2/l1 < gamma_21 and l3/l2 < gamma_32; saliency = l3;
non-max suppression over the non-max radius. All steps are batched
gathers/reductions + one analytic eigendecomposition.

The DEFAULT matches the reference exactly (golden-pinned on bun0,
tests/test_golden_keypoints.py): the scatter matrix is the plain
UNWEIGHTED, unnormalized sum of outer products (reference
iss_3d.hpp:165-208 getScatterMatrix), ties in the non-max suppression
keep all tied maxima (iss_3d.hpp:436 uses strict <), and the non-max
neighborhood must contain >= min_neighbors points (iss_3d.hpp:431).
``density_weights=True`` opts into the Zhong-2009 paper's inverse-density
weighting instead.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from pcl_tpu.core.cloud import Cloud
from pcl_tpu.core import geometry
from pcl_tpu.search import bruteforce


@partial(jax.jit, static_argnames=("k", "min_neighbors", "density_weights"))
def iss3d_keypoints(
    cloud: Cloud,
    salient_radius: float,
    non_max_radius: float,
    gamma_21: float = 0.975,
    gamma_32: float = 0.975,
    min_neighbors: int = 5,
    k: int = 64,
    density_weights: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Returns (keypoint_mask [N] bool, saliency [N] f32 = smallest
    eigenvalue l3). ``k`` caps the neighborhood gather."""
    xyz, mask = cloud.xyz, cloud.mask
    n = cloud.capacity
    idx, d2, valid, count = bruteforce.radius(xyz, mask, xyz, salient_radius, cap=k)
    idxc = jnp.clip(idx, 0, n - 1)
    valid = valid & mask[:, None]

    if density_weights:
        # paper weighting: w_j = 1 / |neighbors(j)|
        wdens = 1.0 / jnp.maximum(count.astype(jnp.float32), 1.0)
        wj = wdens[idxc] * valid.astype(jnp.float32)        # [N,k]
        wsum = jnp.maximum(jnp.sum(wj, axis=1), 1e-12)
    else:
        # reference-exact: plain unweighted, unnormalized sum
        wj = valid.astype(jnp.float32)
        wsum = jnp.ones((n,), jnp.float32)

    nbr = xyz[idxc]                                         # [N,k,3]
    d = nbr - xyz[:, None, :]
    cov = jnp.einsum("nk,nki,nkj->nij", wj, d, d) / wsum[:, None, None]
    lam, _ = geometry.eigh33(cov)                           # ascending
    l3, l2, l1 = lam[:, 0], lam[:, 1], lam[:, 2]
    ok = (
        mask
        & (count >= min_neighbors)
        & (l2 / jnp.maximum(l1, 1e-12) < gamma_21)
        & (l3 / jnp.maximum(l2, 1e-12) < gamma_32)
        & (l3 > 0)
    )
    saliency = jnp.where(ok, l3, -jnp.inf)

    # non-max suppression: keep i iff no neighbor within non_max_radius
    # has STRICTLY larger saliency (ties keep both, reference
    # iss_3d.hpp:436) and the neighborhood holds >= min_neighbors points
    nidx, nd2, nvalid, ncount = bruteforce.radius(xyz, mask, xyz, non_max_radius, cap=k)
    nidxc = jnp.clip(nidx, 0, n - 1)
    nbr_sal = jnp.where(nvalid & mask[:, None], saliency[nidxc], -jnp.inf)
    neigh_max = jnp.max(nbr_sal, axis=1)
    is_max = ok & (ncount >= min_neighbors) & (saliency >= neigh_max)
    return is_max, jnp.where(jnp.isfinite(saliency), saliency, 0.0)
