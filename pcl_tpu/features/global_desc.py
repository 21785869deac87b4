"""Global descriptors — VFH and ESF.

- VFH (reference: features/include/pcl/features/vfh.h, impl/vfh.hpp):
  VFHSignature308 = 4 x 45 bins of extended FPFH angles (alpha, phi, theta,
  distance) between the centroid/average-normal pair and every point, + 128
  bins of viewpoint-direction angles. Angles are computed exactly like the
  reference (Darboux frame on the centroid).
- ESF (reference: esf.h, impl/esf.hpp): ESFSignature640 = 10 x 64-bin
  histograms of shape functions (D2 distances, D2 in/out/mixed ratio, D3
  areas, A3 angles) over random point triples; the voxel in/out tracing of
  the reference is approximated by line-of-sight occupancy against the
  cloud's voxel set (documented deviation: sampling-based, same 640 layout).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from pcl_tpu.core.cloud import Cloud, ATTR_NORMAL
from pcl_tpu.features.fpfh import pair_features, _bin_index, _soft_hist

_EPS = 1e-12


@partial(jax.jit, static_argnames=("nbins_angle", "nbins_vp"))
def estimate_vfh(
    cloud: Cloud,
    viewpoint: Optional[jax.Array] = None,
    nbins_angle: int = 45,
    nbins_vp: int = 128,
) -> jax.Array:
    """One VFH descriptor [4*nbins_angle + nbins_vp] (=308 by default)."""
    if ATTR_NORMAL not in cloud.attrs:
        raise ValueError("estimate_vfh requires normals")
    if viewpoint is None:
        viewpoint = jnp.zeros((3,), jnp.float32)
    xyz, mask = cloud.xyz, cloud.mask
    normals = cloud.attrs[ATTR_NORMAL]
    w = mask.astype(jnp.float32)
    wsum = jnp.maximum(jnp.sum(w), 1.0)
    centroid = jnp.sum(xyz * w[:, None], axis=0) / wsum
    n_c = jnp.sum(normals * w[:, None], axis=0) / wsum
    n_c = n_c / jnp.maximum(jnp.linalg.norm(n_c), _EPS)

    f1, f2, f3, f4, ok = pair_features(
        centroid[None, :], n_c[None, :], xyz, normals
    )
    valid = mask & ok
    wv = valid.astype(jnp.float32)
    incr = 100.0 * wv / jnp.maximum(jnp.sum(wv), 1.0)
    max_d = jnp.max(jnp.where(valid, f4, 0.0))
    h1 = _soft_hist(_bin_index(f1, -jnp.pi, jnp.pi, nbins_angle)[None], incr[None], nbins_angle)[0]
    h2 = _soft_hist(_bin_index(f2, -1.0, 1.0, nbins_angle)[None], incr[None], nbins_angle)[0]
    h3 = _soft_hist(_bin_index(f3, -1.0, 1.0, nbins_angle)[None], incr[None], nbins_angle)[0]
    h4 = _soft_hist(
        _bin_index(f4 / jnp.maximum(max_d, _EPS), 0.0, 1.0, nbins_angle)[None],
        incr[None], nbins_angle,
    )[0]
    # viewpoint component: angle between each normal and the
    # viewpoint-to-centroid direction (reference vfh.hpp viewpoint hist)
    vdir = viewpoint - centroid
    vdir = vdir / jnp.maximum(jnp.linalg.norm(vdir), _EPS)
    cosv = jnp.einsum("ni,i->n", normals, vdir)
    hv = _soft_hist(
        _bin_index(cosv, -1.0, 1.0, nbins_vp)[None], incr[None] * (nbins_vp / 100.0), nbins_vp
    )[0]
    hv = 100.0 * hv / jnp.maximum(jnp.sum(hv), _EPS)
    return jnp.concatenate([h1, h2, h3, h4, hv])


@partial(jax.jit, static_argnames=("n_samples", "nbins"))
def estimate_esf(
    cloud: Cloud,
    key: Optional[jax.Array] = None,
    n_samples: int = 4096,
    nbins: int = 64,
) -> jax.Array:
    """ESF descriptor [10*nbins] (=640) from random point triples."""
    if key is None:
        key = jax.random.PRNGKey(0)
    xyz, mask = cloud.xyz, cloud.mask
    probs = mask.astype(jnp.float32)
    probs = probs / jnp.maximum(jnp.sum(probs), 1.0)
    ks = jax.random.split(key, 3)
    tri = [
        jax.random.categorical(k, jnp.log(probs + 1e-30)[None, :].repeat(n_samples, 0)
                               ).astype(jnp.int32)
        for k in ks
    ]
    a, b, c = xyz[tri[0]], xyz[tri[1]], xyz[tri[2]]
    scale = jnp.maximum(
        jnp.max(jnp.linalg.norm(jnp.where(mask[:, None], xyz, 0.0) -
                                jnp.mean(xyz, axis=0), axis=-1)), _EPS)

    def seg_stats(p, q):
        d = jnp.linalg.norm(p - q, axis=-1)
        return d / (2 * scale)

    d_ab, d_bc, d_ca = seg_stats(a, b), seg_stats(b, c), seg_stats(c, a)
    # D3: sqrt of triangle area
    area = 0.5 * jnp.linalg.norm(jnp.cross(b - a, c - a), axis=-1)
    d3 = jnp.sqrt(jnp.maximum(area, 0.0)) / scale
    # A3: angles of the triangle
    def angle(u, v):
        cu = jnp.einsum("ni,ni->n", u, v) / jnp.maximum(
            jnp.linalg.norm(u, axis=-1) * jnp.linalg.norm(v, axis=-1), _EPS)
        return jnp.arccos(jnp.clip(cu, -1.0, 1.0))

    a1 = angle(b - a, c - a)
    a2 = angle(a - b, c - b)
    a3 = angle(a - c, b - c)

    # in/out/mixed classification by midpoint proximity to the cloud
    # (approximation of the reference's voxel line tracing)
    from pcl_tpu.search import bruteforce
    mids = 0.5 * jnp.concatenate([a + b, b + c, c + a], axis=0)
    _i, md2 = bruteforce.nn1(xyz, mask, mids)
    thr = (0.05 * scale) ** 2
    inside = (md2 <= thr).astype(jnp.float32).reshape(3, n_samples)

    ones = jnp.ones((n_samples,), jnp.float32)

    def hist01(v, w=None):
        w = ones if w is None else w
        h = _soft_hist(_bin_index(v, 0.0, 1.0, nbins)[None], w[None], nbins)[0]
        return h / jnp.maximum(jnp.sum(h), _EPS)

    hists = [
        hist01(d_ab, inside[0]), hist01(d_ab, 1 - inside[0]),   # D2 in/out
        hist01(d_bc), hist01(d_ca),                             # D2 all
        hist01(d3),                                             # D3
        hist01(a1 / jnp.pi), hist01(a2 / jnp.pi), hist01(a3 / jnp.pi),  # A3
        hist01((d_ab + d_bc + d_ca) / 3.0),
        hist01(jnp.abs(d_ab - d_bc)),
    ]
    return jnp.concatenate(hists) * 100.0
