"""Color-augmented pair features — PFHRGB, PPFRGB, CPPF.

Capability match for the reference's color descriptor variants:

- ``estimate_pfhrgb``: pcl::PFHRGBEstimation (reference: features/include/
  pcl/features/pfhrgb.h, impl/pfhrgb.hpp computePointPFHRGBSignature) —
  the 125-bin geometric PFH joint histogram concatenated with a second
  125-bin joint histogram of per-channel color ratios r_i/r_j binned the
  same way -> PFHRGBSignature250.
- ``ppfrgb_features``: pcl::PPFRGBEstimation (ppfrgb.h) — the 4 PPF
  geometry values + 3 color ratios for a point pair.
- ``estimate_cppf``: pcl::CPPFEstimation (cppf.h) — PPF pairs augmented
  with both endpoints' colors (n^2 pair features against the k-neighborhood
  here, as the reference computes them for each (point, neighbor) pair).

All pair terms evaluate on the full [N,k] neighborhoods in one batch.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from pcl_tpu.core.cloud import Cloud, ATTR_NORMAL, ATTR_RGB
from pcl_tpu.features.fpfh import pair_features, _bin_index, _soft_hist
from pcl_tpu.search import bruteforce

_EPS = 1e-9


def _color_ratios(c1: jax.Array, c2: jax.Array) -> jax.Array:
    """Per-channel ratio feature in (0, 1]: min(c1,c2)/max(c1,c2) per
    channel (the reference bins c_i/c_j clipped to its histogram range;
    the symmetric min/max form keeps one bin layout for both orders)."""
    hi = jnp.maximum(jnp.maximum(c1, c2), _EPS)
    lo = jnp.maximum(jnp.minimum(c1, c2), 0.0)
    return lo / hi


@partial(jax.jit, static_argnames=("k", "nr_subdiv"))
def estimate_pfhrgb(
    cloud: Cloud,
    k: int = 10,
    nr_subdiv: int = 5,
) -> jax.Array:
    """[capacity, 2 * nr_subdiv^3] PFHRGB (geometry ++ color histograms)."""
    if ATTR_NORMAL not in cloud.attrs or ATTR_RGB not in cloud.attrs:
        raise ValueError("estimate_pfhrgb requires normals and rgb")
    nrm = cloud.attrs[ATTR_NORMAL]
    rgb = cloud.attrs[ATTR_RGB]
    idx, d2, valid = bruteforce.knn(cloud.xyz, cloud.mask, cloud.xyz, k)
    valid = valid & cloud.mask[:, None]
    cap = cloud.capacity
    idxc = jnp.clip(idx, 0, cap - 1)
    pp = cloud.xyz[idxc]
    nn = nrm[idxc]
    cc = rgb[idxc]

    f1, f2, f3, f4, ok = pair_features(
        pp[:, :, None, :], nn[:, :, None, :], pp[:, None, :, :], nn[:, None, :, :]
    )
    iu = jnp.triu(jnp.ones((k, k), bool), 1)
    pv = valid[:, :, None] & valid[:, None, :] & ok & iu[None]
    w = pv.astype(jnp.float32)
    npairs = jnp.maximum(jnp.sum(w, axis=(-2, -1)), 1.0)

    b1 = _bin_index(f1, -jnp.pi, jnp.pi, nr_subdiv)
    b2 = _bin_index(f2, -1.0, 1.0, nr_subdiv)
    b3 = _bin_index(f3, -1.0, 1.0, nr_subdiv)
    # reference bin layout (pfhrgb mirrors pfh.hpp's h_index order)
    geo = b1 + nr_subdiv * (b2 + nr_subdiv * b3)
    nb = nr_subdiv**3
    flatw = (100.0 * w / npairs[:, None, None]).reshape(w.shape[0], -1)
    hist_geo = _soft_hist(geo.reshape(geo.shape[0], -1), flatw, nb)

    ratios = _color_ratios(cc[:, :, None, :], cc[:, None, :, :])  # [N,k,k,3]
    cb = [_bin_index(ratios[..., c], 0.0, 1.0, nr_subdiv) for c in range(3)]
    col = cb[0] + nr_subdiv * (cb[1] + nr_subdiv * cb[2])
    hist_col = _soft_hist(col.reshape(col.shape[0], -1), flatw, nb)

    out = jnp.concatenate([hist_geo, hist_col], axis=1)
    return jnp.where(cloud.mask[:, None], out, 0.0)


def ppfrgb_features(p1, n1, c1, p2, n2, c2):
    """(f1,f2,f3,f4, r,g,b ratios) for point pairs (ppfrgb.h)."""
    from pcl_tpu.registration.ppf import ppf_features

    f1, f2, f3, f4 = ppf_features(p1, n1, p2, n2)
    rat = _color_ratios(c1, c2)
    return f1, f2, f3, f4, rat[..., 0], rat[..., 1], rat[..., 2]


@partial(jax.jit, static_argnames=("k",))
def estimate_cppf(
    cloud: Cloud,
    k: int = 10,
) -> jax.Array:
    """[capacity, k, 10] CPPF rows per (point, neighbor): 4 PPF values +
    both endpoint color triplets' ratios + distance-normalized color pair
    (cppf.h computeFeature emits one row per pair; here grouped [N,k])."""
    if ATTR_NORMAL not in cloud.attrs or ATTR_RGB not in cloud.attrs:
        raise ValueError("estimate_cppf requires normals and rgb")
    from pcl_tpu.registration.ppf import ppf_features

    nrm = cloud.attrs[ATTR_NORMAL]
    rgb = cloud.attrs[ATTR_RGB]
    idx, d2, valid = bruteforce.knn(cloud.xyz, cloud.mask, cloud.xyz, k + 1)
    idx, valid = idx[:, 1:], valid[:, 1:] & cloud.mask[:, None]
    idxc = jnp.clip(idx, 0, cloud.capacity - 1)
    p2 = cloud.xyz[idxc]
    n2 = nrm[idxc]
    c2 = rgb[idxc]
    p1 = cloud.xyz[:, None, :]
    n1 = nrm[:, None, :]
    c1 = rgb[:, None, :]
    f1, f2, f3, f4 = ppf_features(p1, n1, p2, n2)
    rat = _color_ratios(c1, c2)
    rows = jnp.stack([f1, f2, f3, f4], axis=-1)
    rows = jnp.concatenate([rows, c1 * jnp.ones_like(c2), rat], axis=-1)
    return jnp.where(valid[..., None], rows, 0.0)
