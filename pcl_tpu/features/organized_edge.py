"""Organized edge detection — occluding / occluded / NaN-boundary /
high-curvature / RGB edges on organized clouds.

Re-design of pcl::OrganizedEdgeBase / OrganizedEdgeFromRGB /
OrganizedEdgeFromNormals / OrganizedEdgeFromRGBNormals (reference:
features/include/pcl/features/organized_edge_detection.h + impl,
organized_edge_detection.hpp:83-220): per interior pixel, the depth
differences to the 8 neighbors classify depth discontinuities — the
dominant (largest-magnitude) difference beyond ``th * |z|`` marks the
pixel OCCLUDED when positive (a farther surface behind an occluder) or
OCCLUDING when negative; pixels with invalid neighbors march across the
NaN region along the mean invalid direction to find a corresponding
finite depth (same classification), or become NAN_BOUNDARY when none is
found within ``max_search_neighbors`` steps. RGB edges are Canny over
the mean-channel gray image (hpp:240-270); high-curvature edges are
Canny run on the (n_x, n_y) normal components as gradient images
(hpp:283-330).

TPU re-design: the 8-neighbor pass is 8 rolled image subtractions; the
NaN march is a fixed-length lax.scan of gathered depth lookups; Canny is
the batched image pipeline from ``pcl_tpu.image.ops``. Everything is a
single jit over the [H, W] grid.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from pcl_tpu.core.cloud import Cloud, ATTR_NORMAL, ATTR_RGB
from pcl_tpu.image import ops as img_ops

EDGELABEL_NAN_BOUNDARY = 1
EDGELABEL_OCCLUDING = 2
EDGELABEL_OCCLUDED = 4
EDGELABEL_HIGH_CURVATURE = 8
EDGELABEL_RGB_CANNY = 16

# the reference's 8-neighborhood order (organized_edge_detection.hpp:88):
# (d_col, d_row)
_DIRS = ((-1, 0), (-1, -1), (0, -1), (1, -1),
         (1, 0), (1, 1), (0, 1), (-1, 1))


def _shift(img, d_col, d_row, fill):
    """img[r + d_row, c + d_col] with out-of-range reads returning fill."""
    out = jnp.roll(img, (-d_row, -d_col), axis=(0, 1))
    h, w = img.shape
    rows = jnp.arange(h)[:, None] + d_row
    cols = jnp.arange(w)[None, :] + d_col
    inb = (rows >= 0) & (rows < h) & (cols >= 0) & (cols < w)
    return jnp.where(inb, out, fill)


@partial(jax.jit,
         static_argnames=("edge_types", "max_search_neighbors"))
def organized_edge_detection(
    cloud: Cloud,
    depth_discon_threshold: float = 0.02,
    max_search_neighbors: int = 50,
    edge_types: int = (EDGELABEL_NAN_BOUNDARY | EDGELABEL_OCCLUDING
                       | EDGELABEL_OCCLUDED),
    hc_canny_low: float = 0.4,
    hc_canny_high: float = 1.1,
    rgb_canny_low: float = 40.0,
    rgb_canny_high: float = 100.0,
) -> jax.Array:
    """Edge-type bit labels [capacity] int32 (0 = no edge).

    ``edge_types`` selects which labels to compute (reference
    setEdgeType). HIGH_CURVATURE requires normals on the cloud;
    RGB_CANNY requires an ``rgb`` attr (gray = mean channel, reference
    scale 0..255 for the default thresholds)."""
    h, w = cloud.height, cloud.width
    if h <= 1 or w <= 1 or h * w != cloud.capacity:
        raise ValueError("organized_edge_detection requires an organized cloud")
    z = cloud.xyz[:, 2].reshape(h, w)
    finite = (cloud.mask & jnp.isfinite(cloud.xyz[:, 2])).reshape(h, w)
    zabs = jnp.abs(jnp.where(finite, z, 0.0))
    th = jnp.float32(depth_discon_threshold)

    labels = jnp.zeros((h, w), jnp.int32)
    interior = jnp.zeros((h, w), bool).at[1:-1, 1:-1].set(True)

    if edge_types & (EDGELABEL_NAN_BOUNDARY | EDGELABEL_OCCLUDING
                     | EDGELABEL_OCCLUDED):
        nbr_valid = []
        nbr_dist = []
        for (dc, dr) in _DIRS:
            v = _shift(finite, dc, dr, False)
            nz = _shift(zabs, dc, dr, 0.0)
            nbr_valid.append(v)
            nbr_dist.append(zabs - nz)
        nbr_valid = jnp.stack(nbr_valid)            # [8,H,W]
        nbr_dist = jnp.stack(nbr_dist)
        all_valid = jnp.all(nbr_valid, axis=0)

        # --- all-neighbors-valid: dominant signed depth difference
        mn = jnp.min(nbr_dist, axis=0)
        mx = jnp.max(nbr_dist, axis=0)
        dominant = jnp.where(jnp.abs(mn) > jnp.abs(mx), mn, mx)
        discon = jnp.abs(dominant) > th * zabs
        base = finite & interior & all_valid & discon
        occluded = base & (dominant > 0.0)
        occluding = base & (dominant <= 0.0)

        # --- some invalid neighbors: march across the NaN region along
        # the mean invalid direction (hpp:160-216)
        inv = ~nbr_valid
        n_inv = jnp.sum(inv, axis=0).astype(jnp.float32)
        dx = jnp.einsum("d,dhw->hw",
                        jnp.float32([d[0] for d in _DIRS]),
                        inv.astype(jnp.float32)) / jnp.maximum(n_inv, 1.0)
        dy = jnp.einsum("d,dhw->hw",
                        jnp.float32([d[1] for d in _DIRS]),
                        inv.astype(jnp.float32)) / jnp.maximum(n_inv, 1.0)
        rows = jnp.arange(h)[:, None] * jnp.ones((1, w), jnp.int32)
        cols = jnp.arange(w)[None, :] * jnp.ones((h, 1), jnp.int32)
        zflat = zabs.reshape(-1)
        fflat = finite.reshape(-1)

        def step(carry, s):
            active, corr = carry
            srow = rows + jnp.floor(dy * s).astype(jnp.int32)
            scol = cols + jnp.floor(dx * s).astype(jnp.int32)
            inb = (srow >= 0) & (srow < h) & (scol >= 0) & (scol < w)
            idx = jnp.clip(srow * w + scol, 0, h * w - 1)
            zs = zflat[idx]
            fs = fflat[idx] & inb
            hit = active & fs
            corr = jnp.where(hit, zs, corr)
            active = active & ~fs & inb        # out-of-bounds = break
            return (active, corr), None

        active0 = finite & interior & ~all_valid
        corr0 = jnp.full((h, w), jnp.nan, jnp.float32)
        (_, corr), _ = jax.lax.scan(
            step, (active0, corr0),
            jnp.arange(1, max_search_neighbors, dtype=jnp.float32))
        found = jnp.isfinite(corr)
        dist = zabs - corr
        discon2 = jnp.abs(dist) > th * zabs
        inv_base = finite & interior & ~all_valid
        occluded = occluded | (inv_base & found & discon2 & (dist > 0.0))
        occluding = occluding | (inv_base & found & discon2 & (dist <= 0.0))
        nan_boundary = inv_base & ~found

        if edge_types & EDGELABEL_OCCLUDED:
            labels = labels | jnp.where(occluded, EDGELABEL_OCCLUDED, 0)
        if edge_types & EDGELABEL_OCCLUDING:
            labels = labels | jnp.where(occluding, EDGELABEL_OCCLUDING, 0)
        if edge_types & EDGELABEL_NAN_BOUNDARY:
            labels = labels | jnp.where(nan_boundary,
                                        EDGELABEL_NAN_BOUNDARY, 0)

    if edge_types & EDGELABEL_HIGH_CURVATURE:
        if ATTR_NORMAL not in cloud.attrs:
            raise ValueError("HIGH_CURVATURE edges require normals")
        nrm = cloud.attrs[ATTR_NORMAL]
        nx = nrm[:, 0].reshape(h, w)
        ny = nrm[:, 1].reshape(h, w)
        hc = img_ops.canny_from_gradients(nx, ny, hc_canny_low,
                                          hc_canny_high)
        labels = labels | jnp.where(hc, EDGELABEL_HIGH_CURVATURE, 0)

    if edge_types & EDGELABEL_RGB_CANNY:
        if ATTR_RGB not in cloud.attrs:
            raise ValueError("RGB_CANNY edges require an rgb attr")
        gray = jnp.mean(cloud.attrs[ATTR_RGB], axis=-1).reshape(h, w)
        ce = img_ops.canny(gray, rgb_canny_low, rgb_canny_high)
        labels = labels | jnp.where(ce, EDGELABEL_RGB_CANNY, 0)

    return labels.reshape(-1)


def edge_label_indices(labels, n_types: int = 5):
    """Per-edge-type index lists (assignLabelIndices, hpp:66): a list of
    n_types int arrays — indices whose label has bit ``t`` set."""
    import numpy as np
    lab = np.asarray(labels)
    return [np.flatnonzero((lab >> t) & 1) for t in range(n_types)]
