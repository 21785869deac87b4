"""Surface normal estimation — batched covariance + analytic eigenvector.

TPU-native re-design of pcl::NormalEstimation(+OMP) (reference:
features/include/pcl/features/normal_3d.h:61-122, impl/normal_3d.hpp:48,
normal_3d_omp.hpp:76). PCL loops per point: kNN search -> 3x3 covariance ->
eigen33 -> viewpoint flip. Here the whole cloud is one pipeline:

  knn gather [N,k,3] -> masked covariance einsum (MXU) ->
  analytic eigh33 (VPU, no iteration) -> sign flip -> curvature

Curvature is lambda_0 / (lambda_0+lambda_1+lambda_2) as in the reference
(normal_3d.h:122).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from pcl_tpu.core.cloud import Cloud, ATTR_NORMAL, ATTR_CURVATURE
from pcl_tpu.core import geometry
from pcl_tpu.search import bruteforce, hashgrid as hashgrid_mod


def normals_from_neighborhoods(
    pts: jax.Array,          # [N, 3] query points
    nbr: jax.Array,          # [N, k, 3] gathered neighbor coords
    nbr_valid: jax.Array,    # [N, k] bool
    viewpoint: jax.Array,    # [3]
) -> Tuple[jax.Array, jax.Array]:
    """Core math: per-point plane fit via smallest eigenvector of the
    neighborhood covariance. Returns (normals [N,3], curvature [N])."""
    _, cov, cnt = geometry.mean_and_covariance(nbr, nbr_valid)
    lam, V = geometry.eigh33(cov)
    n = V[..., :, 0]                                   # smallest eigenvector
    # flip toward viewpoint (reference: flipNormalTowardsViewpoint,
    # normal_3d.h:61-117)
    to_vp = viewpoint[None, :] - pts
    flip = jnp.sum(n * to_vp, axis=-1) < 0.0
    n = jnp.where(flip[:, None], -n, n)
    lam_sum = jnp.sum(lam, axis=-1)
    curvature = jnp.where(lam_sum > 0, lam[..., 0] / jnp.maximum(lam_sum, 1e-12), 0.0)
    # degenerate neighborhoods (fewer than 3 points) get a zero normal, like
    # PCL's NaN normal for unfit points
    ok = cnt >= 3.0
    n = jnp.where(ok[:, None], n, 0.0)
    curvature = jnp.where(ok, curvature, 0.0)
    return n, curvature


@partial(jax.jit, static_argnames=("k", "backend", "cell_cap"))
def _estimate_normals_jit(
    cloud: Cloud,
    k: int = 16,
    viewpoint: Optional[jax.Array] = None,
    surface: Optional[Cloud] = None,
    backend: str = "auto",
    cell_size: Optional[float] = None,
    radius: Optional[float] = None,
    cell_cap: int = 24,
) -> Cloud:
    """Attach 'normal' and 'curvature' attrs computed from k-NN neighborhoods.

    ``radius`` gates the k-NN to a ball (the setRadiusSearch analog —
    reference Feature::setRadiusSearch, feature.h:237; the fixed ``k``
    caps the fixed-shape neighbor list: raise it when the density makes a
    radius neighborhood larger than k, which would truncate).
    ``surface`` is the search cloud if different from the query cloud
    (reference: Feature::setSearchSurface, feature.h:129). ``backend``
    follows the unified search auto-selector: brute force on small clouds,
    the packed cell list at scale (300k-point organized frames ran the
    brute O(N^2) sweep before — 6.2 s/frame on a v5e; the cell path is
    the NormalEstimationOMP analog)."""
    if viewpoint is None:
        viewpoint = jnp.zeros((3,), jnp.float32)
    surf = surface if surface is not None else cloud
    organized = (surface is None and cloud.height > 1 and cloud.width > 1
                 and cloud.width * cloud.height == cloud.capacity)
    if backend == "organized" or (backend == "auto" and organized):
        # organized self-query: window-bounded image neighborhoods via
        # pure rolls (the reference auto-selects OrganizedNeighbor for
        # organized clouds the same way, normal_3d via Feature::initCompute
        # -> search::OrganizedNeighbor). Sorts window^2 lanes instead of
        # the cell list's 27*cap (the cell sort was 89 of 255 ms/op on the
        # 307k milk frame).
        if not organized:
            raise ValueError("backend='organized' requires an organized "
                             "self-query cloud")
        from pcl_tpu.search import organized as org_mod
        H, W = cloud.height, cloud.width
        win = 9 if k <= 24 else 13
        idx, d2, valid = org_mod.self_knn(
            cloud.xyz.reshape(H, W, 3), cloud.mask.reshape(H, W), k,
            window=win)
    elif backend == "hashgrid":
        if cell_size is None:
            raise ValueError("hashgrid backend requires cell_size")
        grid = hashgrid_mod.build(surf.xyz, surf.mask, cell_size)
        idx, d2, valid, _ = hashgrid_mod.knn(grid, cloud.xyz, k)
    elif backend == "bruteforce":
        idx, d2, valid = bruteforce.knn(surf.xyz, surf.mask, cloud.xyz, k)
    else:
        from pcl_tpu import search as search_mod
        idx, d2, valid = search_mod.knn(
            surf, cloud.xyz, k, backend=backend, cell_size=cell_size,
            cell_cap=cell_cap)
    nbr = surf.xyz[jnp.clip(idx, 0, surf.capacity - 1)]
    nbr_valid = valid & cloud.mask[:, None]
    if radius is not None:
        nbr_valid = nbr_valid & (d2 <= jnp.float32(radius) ** 2)
    n, c = normals_from_neighborhoods(cloud.xyz, nbr, nbr_valid, viewpoint)
    n = jnp.where(cloud.mask[:, None], n, 0.0)
    c = jnp.where(cloud.mask, c, 0.0)
    return cloud.with_attrs(**{ATTR_NORMAL: n, ATTR_CURVATURE: c})


def estimate_normals(
    cloud: Cloud,
    k: int = 16,
    viewpoint: Optional[jax.Array] = None,
    surface: Optional[Cloud] = None,
    backend: str = "auto",
    cell_size: Optional[float] = None,
    radius: Optional[float] = None,
    cell_cap: Optional[int] = None,
) -> Cloud:
    """Attach 'normal' and 'curvature' attrs computed from k-NN
    neighborhoods (see _estimate_normals_jit for the parameter docs).

    When the cell backend will carry the search (big unorganized cloud)
    and the inputs are concrete, the bucket capacity is auto-probed from
    the cloud's measured density (search.auto_cell_cap) so nonuniform
    clouds don't silently truncate neighbor lists — the fixed default cap
    corrupted normals by up to 60 deg on a 241k organized-scan compaction
    (r5 milk-scene investigation). Inside jit (tracer inputs) the probe
    is skipped; pass ``cell_cap`` explicitly there."""
    if cell_cap is None:
        surf = surface if surface is not None else cloud
        organized = (surface is None and cloud.height > 1 and cloud.width > 1
                     and cloud.width * cloud.height == cloud.capacity)
        concrete = not isinstance(cloud.xyz, jax.core.Tracer)
        engages_cell = backend == "cell" or (
            backend == "auto" and not organized
            and surf.capacity * cloud.capacity > 1e9)
        if concrete and engages_cell:
            from pcl_tpu import search as search_mod
            probed_size, cell_cap = search_mod.auto_cell_params(
                surf, k, cell_size)
            if cell_size is None:
                cell_size = probed_size
    return _estimate_normals_jit(
        cloud, k=k, viewpoint=viewpoint, surface=surface, backend=backend,
        cell_size=cell_size, radius=radius,
        cell_cap=24 if cell_cap is None else cell_cap)


def flip_normals_towards_viewpoint(cloud: Cloud, viewpoint: jax.Array) -> Cloud:
    """Re-orient existing normals toward a viewpoint."""
    n = cloud.attrs[ATTR_NORMAL]
    to_vp = viewpoint[None, :] - cloud.xyz
    flip = jnp.sum(n * to_vp, axis=-1) < 0.0
    return cloud.with_attrs(**{ATTR_NORMAL: jnp.where(flip[:, None], -n, n)})
