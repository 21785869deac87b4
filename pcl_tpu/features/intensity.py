"""Intensity-domain local descriptors: gradient, spin image, RIFT.

Equivalents of pcl::IntensityGradientEstimation (reference: features/include/
pcl/features/intensity_gradient.h — least-squares intensity gradient over the
neighborhood, projected onto the local tangent plane),
pcl::IntensitySpinEstimation (intensity_spin.h — 2D soft histogram over
(distance, intensity)), and pcl::RIFTEstimation (rift.h — rotation-invariant
feature transform: (distance, gradient-orientation) histogram where the
orientation is measured against the outward radial direction).

All are batched: one neighborhood gather, then masked histogram einsums.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from pcl_tpu.core.cloud import Cloud, ATTR_NORMAL, ATTR_INTENSITY
from pcl_tpu.search import bruteforce

_EPS = 1e-12


@partial(jax.jit, static_argnames=("k",))
def intensity_gradient(
    cloud: Cloud,
    radius: float,
    *,
    k: int = 32,
) -> jax.Array:
    """Per-point tangent-plane intensity gradient [N,3] (reference:
    intensity_gradient.h computePointIntensityGradient — solve the 3x3
    normal equations of a linear intensity model, then remove the
    surface-normal component)."""
    if ATTR_INTENSITY not in cloud.attrs:
        raise ValueError("intensity_gradient requires 'intensity'")
    if ATTR_NORMAL not in cloud.attrs:
        raise ValueError("intensity_gradient requires 'normal'")
    xyz, mask = cloud.xyz, cloud.mask
    inten = cloud.attrs[ATTR_INTENSITY]
    normals = cloud.attrs[ATTR_NORMAL]
    idx, d2, valid, _ = bruteforce.radius(xyz, mask, xyz, radius, cap=k)
    idxc = jnp.clip(idx, 0, cloud.capacity - 1)
    valid = valid & mask[:, None]
    w = valid.astype(jnp.float32)
    wsum = jnp.maximum(jnp.sum(w, axis=1), 1.0)

    nbr = xyz[idxc]                                    # [N,k,3]
    nbr_i = inten[idxc]                                # [N,k]
    mu_p = jnp.einsum("nk,nki->ni", w, nbr) / wsum[:, None]
    mu_i = jnp.sum(w * nbr_i, axis=1) / wsum
    dp = (nbr - mu_p[:, None, :]) * w[..., None]
    di = (nbr_i - mu_i[:, None]) * w
    A = jnp.einsum("nki,nkj->nij", dp, dp)             # [N,3,3]
    b = jnp.einsum("nki,nk->ni", dp, di)               # [N,3]
    A = A + 1e-9 * jnp.eye(3, dtype=A.dtype)
    g = jnp.linalg.solve(A, b[..., None])[..., 0]
    # project out the normal component (gradient lives in the tangent plane)
    g = g - jnp.sum(g * normals, axis=-1, keepdims=True) * normals
    cnt_ok = jnp.sum(w, axis=1) >= 3
    return jnp.where((mask & cnt_ok)[:, None], g, 0.0)


@partial(jax.jit, static_argnames=("k", "distance_bins", "intensity_bins"))
def intensity_spin(
    cloud: Cloud,
    radius: float,
    *,
    k: int = 32,
    distance_bins: int = 4,
    intensity_bins: int = 5,
    sigma: float = 1.0,
) -> jax.Array:
    """Intensity spin image [N, distance_bins*intensity_bins] (reference:
    intensity_spin.h computeIntensitySpinImage — soft bilinear votes over
    the (distance, intensity) plane with Gaussian smoothing sigma)."""
    if ATTR_INTENSITY not in cloud.attrs:
        raise ValueError("intensity_spin requires 'intensity'")
    xyz, mask = cloud.xyz, cloud.mask
    inten = cloud.attrs[ATTR_INTENSITY]
    idx, d2, valid, _ = bruteforce.radius(xyz, mask, xyz, radius, cap=k)
    idxc = jnp.clip(idx, 0, cloud.capacity - 1)
    valid = valid & mask[:, None]
    w = valid.astype(jnp.float32)

    d = jnp.sqrt(jnp.maximum(d2, 0.0)) / radius                  # [0,1]
    i_min = jnp.min(jnp.where(mask, inten, jnp.inf))
    i_max = jnp.max(jnp.where(mask, inten, -jnp.inf))
    i_rel = (inten[idxc] - i_min) / jnp.maximum(i_max - i_min, _EPS)

    d_pos = d * distance_bins - 0.5                               # [N,k]
    i_pos = i_rel * intensity_bins - 0.5
    db = jnp.arange(distance_bins, dtype=jnp.float32)
    ib = jnp.arange(intensity_bins, dtype=jnp.float32)
    # Gaussian soft votes (sigma in bins)
    wd = jnp.exp(-0.5 * ((d_pos[..., None] - db) / sigma) ** 2)   # [N,k,D]
    wi = jnp.exp(-0.5 * ((i_pos[..., None] - ib) / sigma) ** 2)   # [N,k,I]
    hist = jnp.einsum("nk,nkd,nki->ndi", w, wd, wi)
    hist = hist.reshape(hist.shape[0], -1)
    total = jnp.maximum(jnp.sum(hist, axis=1, keepdims=True), _EPS)
    return hist / total


@partial(jax.jit, static_argnames=("k", "distance_bins", "gradient_bins"))
def rift(
    cloud: Cloud,
    radius: float,
    gradients: jax.Array,
    *,
    k: int = 32,
    distance_bins: int = 4,
    gradient_bins: int = 8,
) -> jax.Array:
    """RIFT descriptor [N, distance_bins*gradient_bins] (reference: rift.h
    computeRIFT — per-neighbor votes at (normalized distance, angle between
    the intensity gradient and the outward radial direction), bilinear)."""
    xyz, mask = cloud.xyz, cloud.mask
    idx, d2, valid, _ = bruteforce.radius(xyz, mask, xyz, radius, cap=k)
    idxc = jnp.clip(idx, 0, cloud.capacity - 1)
    valid = valid & mask[:, None] & (d2 > _EPS)
    w = valid.astype(jnp.float32)

    nbr = xyz[idxc]
    rel = nbr - xyz[:, None, :]
    d = jnp.sqrt(jnp.maximum(d2, 0.0))
    radial = rel / jnp.maximum(d, _EPS)[..., None]
    g = gradients[idxc]                                           # [N,k,3]
    g_norm = jnp.linalg.norm(g, axis=-1)
    g_unit = g / jnp.maximum(g_norm, _EPS)[..., None]
    cos_t = jnp.clip(jnp.sum(g_unit * radial, axis=-1), -1.0, 1.0)
    theta = jnp.arccos(cos_t)                                     # [0, pi]
    # gradient magnitude weights the vote (reference rift.hpp)
    w = w * g_norm

    d_pos = (d / radius) * distance_bins - 0.5
    t_pos = (theta / jnp.pi) * gradient_bins - 0.5
    db = jnp.arange(distance_bins, dtype=jnp.float32)
    tb = jnp.arange(gradient_bins, dtype=jnp.float32)
    wd = jnp.maximum(1.0 - jnp.abs(d_pos[..., None] - db), 0.0)   # bilinear
    wt = jnp.maximum(1.0 - jnp.abs(t_pos[..., None] - tb), 0.0)
    hist = jnp.einsum("nk,nkd,nkt->ndt", w, wd, wt)
    hist = hist.reshape(hist.shape[0], -1)
    total = jnp.maximum(jnp.sum(hist, axis=1, keepdims=True), _EPS)
    return hist / total
