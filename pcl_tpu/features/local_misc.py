"""Assorted local features: principal curvatures, boundary estimation,
spin images, Difference of Normals, moment of inertia / OBB.

References:
- PrincipalCurvaturesEstimation: features/include/pcl/features/
  principal_curvatures.h (projected normal covariance eigenvalues)
- BoundaryEstimation: boundary.h (max angular gap of neighbors in the
  tangent plane)
- SpinImageEstimation: spin_image.h (radial/height 2D histogram, 153 bins
  at image_width=8)
- DifferenceOfNormalsEstimation: don.h (normal difference across two scales)
- MomentOfInertiaEstimation: moment_of_inertia_estimation.h (global moments,
  eccentricity, AABB/OBB)
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pcl_tpu.core.cloud import Cloud, ATTR_NORMAL
from pcl_tpu.core import geometry
from pcl_tpu.search import bruteforce
from pcl_tpu.features.normals import estimate_normals

_EPS = 1e-12


@partial(jax.jit, static_argnames=("k",))
def principal_curvatures(cloud: Cloud, k: int = 16) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """(pc1 [N], pc2 [N], directions [N,3]) — max/min curvature magnitudes
    and the principal direction, from the eigen-structure of neighbor
    normals projected onto the tangent plane (reference
    impl/principal_curvatures.hpp)."""
    if ATTR_NORMAL not in cloud.attrs:
        raise ValueError("principal_curvatures requires normals")
    xyz, mask = cloud.xyz, cloud.mask
    normals = cloud.attrs[ATTR_NORMAL]
    n = cloud.capacity
    idx, _d2, valid = bruteforce.knn(xyz, mask, xyz, k)
    idxc = jnp.clip(idx, 0, n - 1)
    w = (valid & mask[:, None]).astype(jnp.float32)
    nn = normals[idxc]                                  # [N,k,3]
    nq = normals[:, None, :]
    # project neighbor normals onto the tangent plane of the query normal
    proj = nn - jnp.einsum("nki,ni->nk", nn, normals)[..., None] * nq
    wsum = jnp.maximum(jnp.sum(w, axis=1), 1.0)
    mu = jnp.einsum("nk,nki->ni", w, proj) / wsum[:, None]
    d = proj - mu[:, None, :]
    cov = jnp.einsum("nk,nki,nkj->nij", w, d, d) / wsum[:, None, None]
    lam, V = geometry.eigh33(cov)
    pc1 = lam[:, 2]
    pc2 = lam[:, 1]
    direction = V[..., :, 2]
    ok = mask
    return (jnp.where(ok, pc1, 0.0), jnp.where(ok, pc2, 0.0),
            jnp.where(ok[:, None], direction, 0.0))


@partial(jax.jit, static_argnames=("k",))
def boundary_estimation(
    cloud: Cloud, radius: float, angle_threshold: float = jnp.pi / 2,
    k: int = 48,
) -> jax.Array:
    """[N] bool: is the point on the cloud boundary (reference
    impl/boundary.hpp isBoundaryPoint — the largest angular gap between
    neighbors in the tangent plane exceeds the threshold)."""
    if ATTR_NORMAL not in cloud.attrs:
        raise ValueError("boundary_estimation requires normals")
    xyz, mask = cloud.xyz, cloud.mask
    normals = cloud.attrs[ATTR_NORMAL]
    n = cloud.capacity
    idx, d2, valid, _ = bruteforce.radius(xyz, mask, xyz, radius, cap=k)
    idxc = jnp.clip(idx, 0, n - 1)
    valid = valid & mask[:, None] & (d2 > 0)
    rel = xyz[idxc] - xyz[:, None, :]
    # tangent basis
    nz = normals
    a = jnp.where(jnp.abs(nz[:, 0:1]) < 0.9,
                  jnp.tile(jnp.asarray([1.0, 0, 0]), (n, 1)),
                  jnp.tile(jnp.asarray([0.0, 1, 0]), (n, 1)))
    u = jnp.cross(nz, a)
    u = u / jnp.maximum(jnp.linalg.norm(u, axis=-1, keepdims=True), _EPS)
    v = jnp.cross(nz, u)
    ang = jnp.arctan2(jnp.einsum("nki,ni->nk", rel, v),
                      jnp.einsum("nki,ni->nk", rel, u))     # [N,k] in [-pi,pi]
    ang = jnp.where(valid, ang, jnp.inf)
    ang_sorted = jnp.sort(ang, axis=1)                       # invalid -> +inf last
    cnt = jnp.sum(valid, axis=1)
    # gaps between consecutive angles + wraparound gap
    nxt = jnp.roll(ang_sorted, -1, axis=1)
    gap = nxt - ang_sorted
    lane = jnp.arange(k)
    is_last = lane[None, :] == (cnt - 1)[:, None]
    first = ang_sorted[:, 0]
    wrap = 2 * jnp.pi - (jnp.take_along_axis(
        ang_sorted, jnp.clip(cnt - 1, 0, k - 1)[:, None], axis=1)[:, 0] - first)
    gap = jnp.where(is_last, wrap[:, None], gap)
    gap = jnp.where(lane[None, :] < cnt[:, None], gap, -jnp.inf)
    max_gap = jnp.max(gap, axis=1)
    return mask & ((max_gap > angle_threshold) | (cnt < 3))


@partial(jax.jit, static_argnames=("image_width", "k"))
def spin_images(
    cloud: Cloud, radius: float, image_width: int = 8, k: int = 64,
) -> jax.Array:
    """Spin images [N, (image_width+1)*(2*image_width+1)] (=153 for width 8,
    SpinImage point type; reference impl/spin_image.hpp). Spin coordinates:
    alpha = radial distance from the normal axis, beta = signed height."""
    if ATTR_NORMAL not in cloud.attrs:
        raise ValueError("spin_images requires normals")
    xyz, mask = cloud.xyz, cloud.mask
    normals = cloud.attrs[ATTR_NORMAL]
    n = cloud.capacity
    idx, d2, valid, _ = bruteforce.radius(xyz, mask, xyz, radius, cap=k)
    idxc = jnp.clip(idx, 0, n - 1)
    valid = valid & mask[:, None]
    rel = xyz[idxc] - xyz[:, None, :]
    beta = jnp.einsum("nki,ni->nk", rel, normals)
    alpha = jnp.sqrt(jnp.maximum(jnp.sum(rel * rel, axis=-1) - beta * beta, 0.0))
    na = image_width + 1
    nb = 2 * image_width + 1
    ab = jnp.clip((alpha / radius * image_width).astype(jnp.int32), 0, na - 1)
    bb = jnp.clip(((beta / radius + 1.0) * image_width).astype(jnp.int32), 0, nb - 1)
    joint = ab * nb + bb
    oh = jax.nn.one_hot(joint, na * nb, dtype=jnp.float32)
    hist = jnp.einsum("nk,nkb->nb", valid.astype(jnp.float32), oh)
    s = jnp.maximum(jnp.sum(hist, axis=-1, keepdims=True), _EPS)
    return jnp.where(mask[:, None], hist / s, 0.0)


@partial(jax.jit, static_argnames=("k_small", "k_large"))
def difference_of_normals(
    cloud: Cloud, k_small: int = 8, k_large: int = 32,
) -> jax.Array:
    """DoN magnitude [N] (reference don.h: ||(n_small - n_large)/2||).

    The reference requires consistently-oriented input normals; here the
    small-scale normal's sign is aligned to the large-scale one per point,
    so the result is independent of viewpoint-flip ambiguities."""
    small = estimate_normals(cloud, k=k_small)
    large = estimate_normals(cloud, k=k_large)
    ns = small.attrs[ATTR_NORMAL]
    nl = large.attrs[ATTR_NORMAL]
    ns = jnp.where((jnp.sum(ns * nl, axis=-1) < 0)[:, None], -ns, ns)
    dn = 0.5 * (ns - nl)
    return jnp.where(cloud.mask, jnp.linalg.norm(dn, axis=-1), 0.0)


class MomentsResult(NamedTuple):
    moment_of_inertia: jax.Array     # [S] over view directions
    eccentricity: jax.Array          # [S]
    aabb_min: jax.Array              # [3]
    aabb_max: jax.Array              # [3]
    obb_center: jax.Array            # [3]
    obb_extents: jax.Array           # [3] half sizes
    obb_rotation: jax.Array          # [3,3] columns = OBB axes
    eigenvalues: jax.Array           # [3] descending
    eigenvectors: jax.Array          # [3,3] columns, descending


@partial(jax.jit, static_argnames=("n_steps",))
def moment_of_inertia(cloud: Cloud, n_steps: int = 36) -> MomentsResult:
    """Global moments + AABB/OBB (reference
    moment_of_inertia_estimation.h/hpp)."""
    xyz, mask = cloud.xyz, cloud.mask
    w = mask.astype(jnp.float32)
    wsum = jnp.maximum(jnp.sum(w), 1.0)
    mu = jnp.sum(xyz * w[:, None], axis=0) / wsum
    d = (xyz - mu) * w[:, None]
    cov = jnp.einsum("ni,nj->ij", d, xyz - mu) / wsum
    lam, V = geometry.eigh33(cov)
    lam_desc = lam[::-1]
    V_desc = V[:, ::-1]

    # rotate the major axis around the middle axis, sampling directions
    theta = jnp.linspace(0, jnp.pi, n_steps)
    major, middle = V_desc[:, 0], V_desc[:, 1]
    dirs = (jnp.cos(theta)[:, None] * major[None, :]
            + jnp.sin(theta)[:, None] * middle[None, :])
    dirs = dirs / jnp.maximum(jnp.linalg.norm(dirs, axis=-1, keepdims=True), _EPS)
    # moment of inertia about each axis: sum w * ||x-mu||^2 sin^2 = ||x||^2 - (x.dir)^2
    r2 = jnp.sum(d * d, axis=-1)
    proj = jnp.einsum("ni,si->ns", d, dirs)
    moi = jnp.sum(r2[:, None] - proj**2, axis=0)
    # eccentricity per direction: project onto plane orthogonal to dir
    ecc = jnp.ones_like(moi) * jnp.sqrt(
        jnp.maximum(1.0 - lam_desc[1] / jnp.maximum(lam_desc[0], _EPS), 0.0))

    big = jnp.where(mask[:, None], xyz, jnp.inf)
    small = jnp.where(mask[:, None], xyz, -jnp.inf)
    aabb_min = jnp.min(big, axis=0)
    aabb_max = jnp.max(small, axis=0)

    local = jnp.einsum("ni,ij->nj", xyz - mu, V_desc)
    lmin = jnp.min(jnp.where(mask[:, None], local, jnp.inf), axis=0)
    lmax = jnp.max(jnp.where(mask[:, None], local, -jnp.inf), axis=0)
    obb_center = mu + V_desc @ ((lmin + lmax) * 0.5)
    obb_extents = (lmax - lmin) * 0.5
    return MomentsResult(
        moment_of_inertia=moi,
        eccentricity=ecc,
        aabb_min=aabb_min,
        aabb_max=aabb_max,
        obb_center=obb_center,
        obb_extents=obb_extents,
        obb_rotation=V_desc,
        eigenvalues=lam_desc,
        eigenvectors=V_desc,
    )


@partial(jax.jit, static_argnames=("k",))
def moment_invariants(cloud: Cloud, radius: float, k: int = 32) -> jax.Array:
    """Per-point moment invariants [N,3] = (j1, j2, j3) of the neighborhood
    central second moments (reference: features/include/pcl/features/
    moment_invariants.h computePointMomentInvariants)."""
    xyz, mask = cloud.xyz, cloud.mask
    idx, d2, valid, _ = bruteforce.radius(xyz, mask, xyz, radius, cap=k)
    idxc = jnp.clip(idx, 0, cloud.capacity - 1)
    valid = valid & mask[:, None]
    w = valid.astype(jnp.float32)
    wsum = jnp.maximum(jnp.sum(w, axis=1), 1.0)
    nbr = xyz[idxc]
    mu = jnp.einsum("nk,nki->ni", w, nbr) / wsum[:, None]
    d = nbr - mu[:, None, :]
    m = jnp.einsum("nk,nki,nkj->nij", w, d, d)          # [N,3,3] central moments
    mu200, mu020, mu002 = m[:, 0, 0], m[:, 1, 1], m[:, 2, 2]
    mu110, mu101, mu011 = m[:, 0, 1], m[:, 0, 2], m[:, 1, 2]
    j1 = mu200 + mu020 + mu002
    j2 = (mu200 * mu020 + mu200 * mu002 + mu020 * mu002
          - mu110 ** 2 - mu101 ** 2 - mu011 ** 2)
    j3 = (mu200 * mu020 * mu002 + 2.0 * mu110 * mu101 * mu011
          - mu002 * mu110 ** 2 - mu020 * mu101 ** 2 - mu200 * mu011 ** 2)
    return jnp.where(mask[:, None], jnp.stack([j1, j2, j3], axis=-1), 0.0)


@partial(jax.jit, static_argnames=("image_width", "k", "radial", "angular",
                                   "min_pts", "support_angle_cos"))
def spin_images_reference(
    cloud: Cloud,
    radius: float,
    image_width: int = 8,
    support_angle_cos: float = 0.0,
    k: int = 256,
    radial: bool = False,
    angular: bool = False,
    min_pts: int = 1,
) -> jax.Array:
    """Reference-EXACT spin images (reference: features/include/pcl/
    features/impl/spin_image.hpp computeSiForPoint :69-234): cylindrical
    (alpha, beta) coordinates about the point normal, bilinear binning
    into an (image_width+1) x (2*image_width+1) matrix with the
    reference's border hacks, support-angle filtering, and the three
    domains (rectangular / radial / angular). Returns
    [capacity, (w+1)*(2w+1)] (153 for w=8), flattened
    alpha-row-major like the reference's copy loop (spin_image.hpp:335). Golden-pinned on bun0
    (tests/test_golden_features.py)."""
    from pcl_tpu.search import bruteforce
    if ATTR_NORMAL not in cloud.attrs:
        raise ValueError("spin_images_reference requires normals")
    xyz, mask = cloud.xyz, cloud.mask
    nrm = cloud.attrs[ATTR_NORMAL]
    n = cloud.capacity
    w = image_width
    idx, d2, valid = bruteforce.knn(xyz, mask, xyz, k)
    valid = valid & (d2 <= jnp.float32(radius) ** 2) & mask[:, None]
    idxc = jnp.clip(idx, 0, n - 1)
    n_neigh = jnp.sum(valid, axis=1)            # includes the point itself
    cosbn = jnp.clip(jnp.einsum("ni,nki->nk", nrm, nrm[idxc]), -1.0, 1.0)
    keep = valid
    if support_angle_cos > 0.0 or angular:
        keep = keep & (jnp.abs(cosbn) >= support_angle_cos)
    cos_pos = jnp.abs(cosbn)                    # counter-directed allowed
    direction = xyz[idxc] - xyz[:, None, :]
    dn = jnp.sqrt(jnp.maximum(d2, 0.0))
    keep = keep & (d2 > 0.0)
    cda = jnp.clip(jnp.einsum("nki,ni->nk", direction, nrm)
                   / jnp.maximum(dn, 1e-30), -1.0, 1.0)
    if radial:
        bin_size = radius / w
        beta = jnp.arcsin(cda)
        alpha = dn
        beta_bin_size = jnp.pi / 2.0 / w
    else:
        bin_size = radius / w / np.sqrt(2.0)
        beta = dn * cda
        alpha = dn * jnp.sqrt(jnp.maximum(1.0 - cda * cda, 0.0))
        keep = keep & (jnp.abs(beta) < bin_size * w) & (alpha < bin_size * w)
        beta_bin_size = bin_size
    bbin = jnp.floor(beta / beta_bin_size).astype(jnp.int32) + w
    abin = jnp.floor(alpha / bin_size).astype(jnp.int32)
    a_border = abin == w
    b_border = bbin == 2 * w
    abin = jnp.where(a_border, abin - 1, abin)
    bbin = jnp.where(b_border, bbin - 1, bbin)
    a = jnp.where(a_border, 1.0, alpha / bin_size - abin)
    b = jnp.where(b_border, 1.0, beta / beta_bin_size - (bbin - w))
    a = jnp.clip(a, 0.0, 1.0)
    b = jnp.clip(b, 0.0, 1.0)
    abin = jnp.clip(abin, 0, w - 1)
    bbin = jnp.clip(bbin, 0, 2 * w - 1)
    cols_n = 2 * w + 1
    # reference copy order: histogram[row * cols + col] with row = alpha
    # bin, col = beta bin (spin_image.hpp:335)
    t00 = abin * cols_n + bbin
    t10 = t00 + cols_n
    t01 = t00 + 1
    t11 = t10 + 1
    kf = keep.astype(jnp.float32)
    w00 = (1 - a) * (1 - b) * kf
    w10 = a * (1 - b) * kf
    w01 = (1 - a) * b * kf
    w11 = a * b * kf
    T = jnp.stack([t00, t10, t01, t11], axis=-1)           # [N,k,4]
    W = jnp.stack([w00, w10, w01, w11], axis=-1)
    nb = (w + 1) * cols_n
    rows_idx = jnp.broadcast_to(jnp.arange(n)[:, None, None], T.shape)
    hist = jnp.zeros((n, nb), jnp.float32).at[rows_idx, T].add(W)
    if angular:
        ang = jnp.arccos(cos_pos)
        WA = W * ang[..., None]
        asum = jnp.zeros((n, nb), jnp.float32).at[rows_idx, T].add(WA)
        out = asum / (hist + 1e-16)
    else:
        s = jnp.sum(hist, axis=1, keepdims=True)
        out = jnp.where((n_neigh > 1)[:, None] & (s > 0), hist
                        / jnp.maximum(s, 1e-30), hist)
    ok = mask & (n_neigh >= min_pts)
    return jnp.where(ok[:, None], out, 0.0)
