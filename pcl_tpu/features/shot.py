"""SHOT descriptor — Signature of Histograms of OrienTations.

Re-design of pcl::SHOTEstimation (reference: features/include/pcl/features/
shot.h, impl/shot.hpp; LRF at shot_lrf.h, impl/shot_lrf.hpp). Layout matches
SHOT352 (common/include/pcl/impl/point_types.hpp:1986): 32 spatial sectors
(8 azimuth x 2 elevation x 2 radial shells) x 11 cosine bins, L2-normalized.

The local reference frame follows the reference: radius-weighted covariance
(weight = r - d), eigenvectors with sign disambiguation by majority vote of
neighbor directions (shot_lrf.hpp). Binning here is hard (nearest bin)
rather than PCL's quadrilinear interpolation — descriptors remain stable
under rigid motion, with slightly sharper histograms (documented deviation).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from pcl_tpu.core.cloud import Cloud, ATTR_NORMAL
from pcl_tpu.core import geometry
from pcl_tpu.search import bruteforce

_EPS = 1e-12


def local_reference_frames(
    pts: jax.Array,         # [N,3]
    nbr: jax.Array,         # [N,k,3]
    nbr_valid: jax.Array,   # [N,k]
    radius: float,
) -> Tuple[jax.Array, jax.Array]:
    """Batched SHOT LRFs. Returns (frames [N,3,3] rows = (x,y,z) axes,
    ok [N])."""
    d = nbr - pts[:, None, :]
    dist = jnp.linalg.norm(d, axis=-1)
    w = jnp.where(nbr_valid, jnp.maximum(radius - dist, 0.0), 0.0)
    wsum = jnp.maximum(jnp.sum(w, axis=1), _EPS)
    cov = jnp.einsum("nk,nki,nkj->nij", w, d, d) / wsum[:, None, None]
    lam, V = geometry.eigh33(cov)
    # eigh33 ascending: x-axis = largest (col 2), z-axis = smallest (col 0)
    x = V[..., :, 2]
    z = V[..., :, 0]
    # sign disambiguation: majority of weighted neighbor directions positive
    sx = jnp.einsum("nk,nki,ni->n", w, d, x)
    x = jnp.where((sx < 0)[:, None], -x, x)
    sz = jnp.einsum("nk,nki,ni->n", w, d, z)
    z = jnp.where((sz < 0)[:, None], -z, z)
    y = jnp.cross(z, x)
    ok = jnp.sum(nbr_valid, axis=1) >= 5
    frames = jnp.stack([x, y, z], axis=-2)          # rows
    return frames, ok


@partial(jax.jit, static_argnames=("k", "n_cos_bins"))
def estimate_shot(
    cloud: Cloud,
    radius: float,
    k: int = 64,
    n_cos_bins: int = 11,
    backend: str = "auto",
) -> jax.Array:
    """SHOT descriptors [capacity, 352]. Requires normals. ``backend``
    follows the unified search auto-selector (cell list at scale)."""
    if ATTR_NORMAL not in cloud.attrs:
        raise ValueError("estimate_shot requires normals")
    from pcl_tpu import search as search_mod
    xyz, mask = cloud.xyz, cloud.mask
    normals = cloud.attrs[ATTR_NORMAL]
    n = cloud.capacity
    idx, d2, valid, _count = search_mod.radius_search(
        cloud, xyz, radius, cap=k, backend=backend)
    idxc = jnp.clip(idx, 0, n - 1)
    valid = valid & mask[:, None] & (d2 > 0)        # exclude self
    nbr = xyz[idxc]
    nbr_n = normals[idxc]

    frames, ok = local_reference_frames(xyz, nbr, valid, radius)
    # local coordinates
    rel = nbr - xyz[:, None, :]
    local = jnp.einsum("nai,nki->nka", frames, rel)     # [N,k,3] (x,y,z)
    dist = jnp.linalg.norm(rel, axis=-1)

    # spatial sector: 8 azimuth x 2 elevation (z sign) x 2 radial shells
    az = jnp.arctan2(local[..., 1], local[..., 0])      # [-pi, pi]
    az_bin = jnp.clip(jnp.floor((az + jnp.pi) / (2 * jnp.pi) * 8), 0, 7).astype(jnp.int32)
    el_bin = (local[..., 2] > 0).astype(jnp.int32)
    r_bin = (dist > radius * 0.5).astype(jnp.int32)
    sector = (az_bin * 2 + el_bin) * 2 + r_bin          # [N,k] in [0,32)

    # cosine of angle between neighbor normal and the query z axis
    cosang = jnp.einsum("ni,nki->nk", frames[:, 2, :], nbr_n)
    cos_bin = jnp.clip(
        jnp.floor((cosang + 1.0) * 0.5 * n_cos_bins), 0, n_cos_bins - 1
    ).astype(jnp.int32)

    joint = sector * n_cos_bins + cos_bin               # [N,k]
    nb = 32 * n_cos_bins
    w = valid.astype(jnp.float32)
    oh = jax.nn.one_hot(joint, nb, dtype=jnp.float32)
    hist = jnp.einsum("nk,nkb->nb", w, oh)
    norm = jnp.maximum(jnp.linalg.norm(hist, axis=-1, keepdims=True), _EPS)
    out = hist / norm
    return jnp.where((mask & ok)[:, None], out, 0.0)


def _rgb_to_lab(rgb: jax.Array) -> jax.Array:
    """sRGB in [0,1] -> CIELab (D65), vectorized (the conversion
    SHOTColorEstimation uses, impl/shot.hpp RGB2CIELAB)."""
    c = jnp.where(rgb > 0.04045, ((rgb + 0.055) / 1.055) ** 2.4, rgb / 12.92)
    M = jnp.array([[0.412453, 0.357580, 0.180423],
                   [0.212671, 0.715160, 0.072169],
                   [0.019334, 0.119193, 0.950227]], jnp.float32)
    xyz = c @ M.T
    white = jnp.array([0.95047, 1.0, 1.08883], jnp.float32)
    t = xyz / white
    f = jnp.where(t > 0.008856, jnp.cbrt(t), 7.787 * t + 16.0 / 116.0)
    L = 116.0 * f[..., 1] - 16.0
    a = 500.0 * (f[..., 0] - f[..., 1])
    b = 200.0 * (f[..., 1] - f[..., 2])
    return jnp.stack([L, a, b], axis=-1)


@partial(jax.jit, static_argnames=("k", "n_cos_bins", "n_color_bins"))
def estimate_shot_color(
    cloud: Cloud,
    radius: float,
    k: int = 64,
    n_cos_bins: int = 11,
    n_color_bins: int = 31,
) -> jax.Array:
    """SHOT color descriptors [capacity, 1344] (SHOT1344 layout,
    common/include/pcl/impl/point_types.hpp:1986 / SHOTColorEstimation at
    features/include/pcl/features/shot.h): the 352-bin shape signature
    concatenated with 32 sectors x 31 bins of CIELab L1 color distance
    between the query and each neighbor. Requires normals + rgb."""
    from pcl_tpu.core.cloud import ATTR_RGB

    if ATTR_NORMAL not in cloud.attrs or ATTR_RGB not in cloud.attrs:
        raise ValueError("estimate_shot_color requires normals and rgb")
    xyz, mask = cloud.xyz, cloud.mask
    normals = cloud.attrs[ATTR_NORMAL]
    lab = _rgb_to_lab(cloud.attrs[ATTR_RGB])
    n = cloud.capacity
    idx, d2, valid, _count = bruteforce.radius(xyz, mask, xyz, radius, cap=k)
    idxc = jnp.clip(idx, 0, n - 1)
    valid = valid & mask[:, None] & (d2 > 0)
    nbr = xyz[idxc]
    nbr_n = normals[idxc]
    nbr_lab = lab[idxc]

    frames, ok = local_reference_frames(xyz, nbr, valid, radius)
    rel = nbr - xyz[:, None, :]
    local = jnp.einsum("nai,nki->nka", frames, rel)
    dist = jnp.linalg.norm(rel, axis=-1)
    az = jnp.arctan2(local[..., 1], local[..., 0])
    az_bin = jnp.clip(jnp.floor((az + jnp.pi) / (2 * jnp.pi) * 8), 0, 7).astype(jnp.int32)
    el_bin = (local[..., 2] > 0).astype(jnp.int32)
    r_bin = (dist > radius * 0.5).astype(jnp.int32)
    sector = (az_bin * 2 + el_bin) * 2 + r_bin
    w = valid.astype(jnp.float32)

    # shape part (352)
    cosang = jnp.einsum("ni,nki->nk", frames[:, 2, :], nbr_n)
    cos_bin = jnp.clip(
        jnp.floor((cosang + 1.0) * 0.5 * n_cos_bins), 0, n_cos_bins - 1
    ).astype(jnp.int32)
    shape_hist = jnp.einsum(
        "nk,nkb->nb", w,
        jax.nn.one_hot(sector * n_cos_bins + cos_bin, 32 * n_cos_bins,
                       dtype=jnp.float32))

    # color part (32 x 31 = 992): normalized L1 CIELab distance
    # (reference impl/shot.hpp: (|dL|/100 + (|da|/120 + |db|/120)/2) / 3,
    # clamped to [0,1] — L spans [0,100], a/b roughly [-120,120])
    dl = jnp.abs(nbr_lab[..., 0] - lab[:, None, 0]) / 100.0
    da = jnp.abs(nbr_lab[..., 1] - lab[:, None, 1]) / 120.0
    db = jnp.abs(nbr_lab[..., 2] - lab[:, None, 2]) / 120.0
    ldist = jnp.clip((dl + (da + db) * 0.5) / 3.0, 0.0, 1.0)
    col_bin = jnp.clip(
        jnp.floor(ldist * n_color_bins), 0, n_color_bins - 1
    ).astype(jnp.int32)
    color_hist = jnp.einsum(
        "nk,nkb->nb", w,
        jax.nn.one_hot(sector * n_color_bins + col_bin, 32 * n_color_bins,
                       dtype=jnp.float32))

    out = jnp.concatenate([shape_hist, color_hist], axis=-1)
    norm = jnp.maximum(jnp.linalg.norm(out, axis=-1, keepdims=True), _EPS)
    out = out / norm
    return jnp.where((mask & ok)[:, None], out, 0.0)
