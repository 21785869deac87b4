"""Clustered viewpoint feature histograms (CVFH, OUR-CVFH) and the camera
roll histogram (CRH).

Equivalents of pcl::CVFHEstimation (reference: features/include/pcl/features/
cvfh.h — smooth-surface clustering then one VFH per stable cluster),
pcl::OURCVFHEstimation (our_cvfh.h — CVFH + semi-global unique reference
frames; here the SGURF roll normalization is realized by appending the
cluster's roll histogram), and pcl::CRHEstimation (crh.h — 90-bin histogram
of point angles about the camera axis, used to recover the roll angle that
VFH-style descriptors are blind to). crh_align recovers the roll between two
CRHs by circular cross-correlation (reference: recognition CRHAlignment),
computed with jnp.fft on device.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from pcl_tpu.core.cloud import Cloud, ATTR_NORMAL, ATTR_CURVATURE
from pcl_tpu.features.global_desc import estimate_vfh

_EPS = 1e-12


class ClusteredSignatures(NamedTuple):
    histograms: jax.Array     # [C_max, D] one descriptor per cluster
    centroids: jax.Array      # [C_max, 3]
    valid: jax.Array          # [C_max] bool — cluster exists & large enough


def _cluster_masks(cloud: Cloud, max_clusters: int,
                   eps_angle: float, curvature_threshold: float,
                   min_points: int) -> Tuple[jax.Array, jax.Array]:
    """Smooth-region clustering -> [C_max, N] bool masks + [C_max] valid."""
    from pcl_tpu.segmentation.region_growing import region_growing

    labels, _ = region_growing(
        cloud,
        smoothness_threshold=eps_angle,
        curvature_threshold=curvature_threshold,
        min_cluster_size=min_points,
    )
    cluster_ids = jnp.arange(max_clusters, dtype=jnp.int32)
    masks = labels[None, :] == cluster_ids[:, None]            # [C,N]
    valid = jnp.sum(masks, axis=1) >= min_points
    return masks, valid


def estimate_cvfh(
    cloud: Cloud,
    viewpoint: Optional[jax.Array] = None,
    *,
    max_clusters: int = 8,
    eps_angle: float = 0.13,          # reference cvfh.h cluster_tolerance ~7.5deg
    curvature_threshold: float = 0.025,
    min_points: int = 50,
) -> ClusteredSignatures:
    """CVFH: one 308-d VFH per smooth cluster (reference cvfh.h:
    filterNormalsWithHighCurvature + extractEuclideanClustersSmooth +
    per-cluster VFH about the cluster centroid/normal)."""
    if ATTR_NORMAL not in cloud.attrs:
        raise ValueError("estimate_cvfh requires normals")
    if viewpoint is None:
        viewpoint = jnp.zeros((3,), jnp.float32)
    masks, valid = _cluster_masks(
        cloud, max_clusters, eps_angle, curvature_threshold, min_points)

    def one(m):
        sub = Cloud(xyz=cloud.xyz, mask=m & cloud.mask, attrs=cloud.attrs)
        h = estimate_vfh(sub, viewpoint)
        w = (m & cloud.mask).astype(jnp.float32)
        c = jnp.sum(cloud.xyz * w[:, None], axis=0) / jnp.maximum(jnp.sum(w), 1.0)
        return h, c

    hists, cents = jax.vmap(one)(masks)
    hists = jnp.where(valid[:, None], hists, 0.0)
    return ClusteredSignatures(hists, cents, valid)


def estimate_our_cvfh(
    cloud: Cloud,
    viewpoint: Optional[jax.Array] = None,
    *,
    max_clusters: int = 8,
    eps_angle: float = 0.13,
    curvature_threshold: float = 0.025,
    min_points: int = 50,
    roll_bins: int = 90,
) -> ClusteredSignatures:
    """OUR-CVFH: CVFH plus a roll-normalizing component per cluster
    (reference our_cvfh.h — the SGURF reference frame fixes the camera-roll
    ambiguity; here realized by appending each cluster's roll histogram,
    which carries the same information in histogram form)."""
    if viewpoint is None:
        viewpoint = jnp.zeros((3,), jnp.float32)
    base = estimate_cvfh(
        cloud, viewpoint, max_clusters=max_clusters, eps_angle=eps_angle,
        curvature_threshold=curvature_threshold, min_points=min_points)
    masks, _ = _cluster_masks(
        cloud, max_clusters, eps_angle, curvature_threshold, min_points)

    def one(m):
        sub = Cloud(xyz=cloud.xyz, mask=m & cloud.mask, attrs=cloud.attrs)
        return estimate_crh(sub, viewpoint, nbins=roll_bins)

    rolls = jax.vmap(one)(masks)
    hists = jnp.concatenate([base.histograms, rolls], axis=-1)
    hists = jnp.where(base.valid[:, None], hists, 0.0)
    return ClusteredSignatures(hists, base.centroids, base.valid)


@partial(jax.jit, static_argnames=("nbins",))
def estimate_crh(
    cloud: Cloud,
    viewpoint: Optional[jax.Array] = None,
    nbins: int = 90,
) -> jax.Array:
    """Camera roll histogram [nbins] (reference crh.h — project each point's
    normal onto the plane orthogonal to the camera->centroid axis, histogram
    the resulting roll angles weighted by projection magnitude)."""
    if ATTR_NORMAL not in cloud.attrs:
        raise ValueError("estimate_crh requires normals")
    if viewpoint is None:
        viewpoint = jnp.zeros((3,), jnp.float32)
    xyz, mask = cloud.xyz, cloud.mask
    normals = cloud.attrs[ATTR_NORMAL]
    w = mask.astype(jnp.float32)
    wsum = jnp.maximum(jnp.sum(w), 1.0)
    centroid = jnp.sum(xyz * w[:, None], axis=0) / wsum
    axis = centroid - viewpoint
    axis = axis / jnp.maximum(jnp.linalg.norm(axis), _EPS)
    # orthonormal basis of the plane orthogonal to the view axis
    ref = jnp.where(jnp.abs(axis[2]) < 0.9,
                    jnp.asarray([0.0, 0.0, 1.0], axis.dtype),
                    jnp.asarray([1.0, 0.0, 0.0], axis.dtype))
    u = jnp.cross(ref, axis)
    u = u / jnp.maximum(jnp.linalg.norm(u), _EPS)
    v = jnp.cross(axis, u)
    nu = normals @ u
    nv = normals @ v
    mag = jnp.sqrt(nu * nu + nv * nv)
    ang = jnp.arctan2(nv, nu)                         # [-pi, pi)
    pos = (ang + jnp.pi) / (2 * jnp.pi) * nbins
    b0 = jnp.floor(pos).astype(jnp.int32) % nbins
    b1 = (b0 + 1) % nbins
    f = pos - jnp.floor(pos)
    wt = w * mag
    hist = jnp.zeros((nbins,), jnp.float32)
    hist = hist.at[b0].add(wt * (1 - f)).at[b1].add(wt * f)
    return hist / jnp.maximum(jnp.sum(hist), _EPS)


@partial(jax.jit, static_argnames=("n_peaks",))
def crh_align(crh_a: jax.Array, crh_b: jax.Array, n_peaks: int = 1):
    """Roll angle(s) aligning histogram b onto a by circular
    cross-correlation (reference: recognition/include/pcl/recognition/
    crh_alignment.h computeRollAngle — FFT correlation, peak extraction).
    Returns (angles [n_peaks] radians, scores [n_peaks])."""
    nbins = crh_a.shape[0]
    fa = jnp.fft.rfft(crh_a)
    fb = jnp.fft.rfft(crh_b)
    corr = jnp.fft.irfft(fa * jnp.conj(fb), n=nbins)
    order = jnp.argsort(-corr)
    peaks = order[:n_peaks]
    angles = peaks.astype(jnp.float32) / nbins * 2 * jnp.pi
    # wrap to [-pi, pi)
    angles = jnp.where(angles >= jnp.pi, angles - 2 * jnp.pi, angles)
    return angles, corr[peaks]
