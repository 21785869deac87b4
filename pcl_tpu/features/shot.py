"""SHOT descriptor — Signature of Histograms of OrienTations.

Re-design of pcl::SHOTEstimation (reference: features/include/pcl/features/
shot.h, impl/shot.hpp; LRF at shot_lrf.h, impl/shot_lrf.hpp). Layout matches
SHOT352 (common/include/pcl/impl/point_types.hpp:1986): 32 spatial sectors
(8 azimuth x 2 elevation x 2 radial shells) x 11 cosine bins, L2-normalized.

The local reference frame follows the reference: radius-weighted covariance
(weight = r - d), eigenvectors with sign disambiguation by majority vote of
neighbor directions (shot_lrf.hpp). The DEFAULT ``estimate_shot`` is the
reference-exact quadrilinear-interpolated form (golden-pinned on bun0);
``estimate_shot_hard`` is an opt-in faster variant that hard-bins (nearest
bin) — stable under rigid motion, slightly sharper histograms, 1 scatter
per neighbor instead of 5, but NOT bit-compatible with reference
descriptors.
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


def estimate_shot(
    cloud: Cloud,
    radius: float,
    k: int = 64,
    n_cos_bins: int = 11,
    backend: str = "auto",
    interpolated: bool = True,
    surface: "Cloud" = None,
    cell_cap: int = None,
) -> jax.Array:
    """SHOT descriptors [capacity, 352]. Requires normals.

    Default is the reference-EXACT quadrilinear-interpolated descriptor
    (``estimate_shot_interpolated``); pass ``interpolated=False`` for the
    cheaper hard-binned variant (not bit-compatible with the reference).
    ``backend`` follows the unified search auto-selector (cell list at
    scale). ``n_cos_bins`` other than 11 forces the hard variant (the
    reference layout is fixed at 32 x 11). ``surface`` = setSearchSurface
    (interpolated path only)."""
    if interpolated and n_cos_bins == 11:
        return estimate_shot_interpolated(cloud, radius, k=k, backend=backend,
                                          surface=surface, cell_cap=cell_cap)
    return estimate_shot_hard(cloud, radius, k=k, n_cos_bins=n_cos_bins,
                              backend=backend)


@partial(jax.jit, static_argnames=("k", "n_cos_bins", "backend"))
def estimate_shot_hard(
    cloud: Cloud,
    radius: float,
    k: int = 64,
    n_cos_bins: int = 11,
    backend: str = "auto",
) -> jax.Array:
    """Hard-binned (nearest-bin) SHOT [capacity, 352] — the fast opt-in
    variant; see module docstring. Requires normals."""
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


@partial(jax.jit, static_argnames=("k", "backend", "cell_cap"))
def estimate_shot_interpolated(
    cloud: Cloud,
    radius: float,
    k: int = 128,
    backend: str = "auto",
    surface: "Cloud" = None,
    cell_cap: int = None,
) -> jax.Array:
    """Reference-EXACT SHOT352 — the DEFAULT ``estimate_shot`` path:
    quadrilinear interpolation + the reference's LRF, bin layout and
    normalization (reference: features/include/pcl/features/impl/shot.hpp
    interpolateSingleChannel :300-430, shot_lrf.hpp getLocalRF :60-165).
    Golden-pinned on bun0 (tests/test_golden_features.py). ``backend``
    follows the unified search auto-selector: at scale the cell list
    (cell_size = radius, 27-cell probe) supplies the same ascending-
    distance neighbor list as brute force, exact within ``radius`` when
    no bucket truncates.

    ``surface`` is the reference's setSearchSurface (feature.h:129): when
    given, descriptors are computed at ``cloud``'s points but neighbor-
    hoods and normals come from ``surface`` (keypoint-query SHOT, the
    recognition-pipeline pattern of test_recognition_cg.cpp:205-215)."""
    src = surface if surface is not None else cloud
    if ATTR_NORMAL not in src.attrs:
        raise ValueError("estimate_shot requires normals")
    from pcl_tpu import search as search_mod
    from pcl_tpu.core import geometry
    xyz, mask = cloud.xyz, cloud.mask
    normals = src.attrs[ATTR_NORMAL]
    n = src.capacity
    nq = cloud.capacity
    nb = 10                                 # nr_shape_bins (desc = 32*11)
    organized = (surface is None and cloud.height > 1 and cloud.width > 1
                 and cloud.width * cloud.height == cloud.capacity)
    if backend == "auto" and organized:
        # organized frames: window-bounded image-neighborhood search (the
        # reference's OrganizedNeighbor auto-selection), ascending order
        # preserved by the lane sort
        from pcl_tpu.search import organized as org_mod
        H, W = cloud.height, cloud.width
        win = 9 if k <= 24 else 13
        idx, d2, valid = org_mod.self_knn(
            xyz.reshape(H, W, 3), mask.reshape(H, W), k, window=win)
    else:
        # bucket capacity must track k: the default cap (24) silently
        # drops near neighbors in dense buckets (a 241k scene at
        # r=0.015 holds ~200 points/cell), which corrupts descriptors
        cap = max(24, k) if cell_cap is None else cell_cap
        idx, d2, valid = search_mod.knn(
            src, xyz, k, backend=backend, cell_size=radius,
            cell_cap=cap)[:3]
    r2 = jnp.float32(radius) ** 2
    # invalid lanes may carry inf sqdist; make them finite so the masked
    # interpolation weights below stay nan-free (0 * inf poisons scatters)
    d2 = jnp.where(jnp.isfinite(d2), d2, 4.0 * r2)
    valid = valid & (d2 <= r2) & mask[:, None]
    idxc = jnp.clip(idx, 0, n - 1)
    # ONE packed gather for coords + normals: two separate [N*k]-row
    # gathers from [N,3] operands were 120 ms/op at the 307k milk frame
    packed = jnp.concatenate([src.xyz, normals], axis=1)    # [N,6]
    pg = packed[idxc]                                       # [N,k,6]
    nbr = pg[..., :3]
    nrm_nbr = pg[..., 3:6]
    vij = nbr - xyz[:, None, :]
    d = jnp.sqrt(jnp.maximum(d2, 0.0))
    okn = valid & (d2 > 0.0)                # exclude the query itself

    # --- LRF (shot_lrf.hpp): (r - d)-weighted covariance, x = largest
    # eigenvector, z = smallest, majority sign disambiguation with the
    # reference's 5-sample median-window tie-break, y = z cross x
    w = jnp.where(okn, radius - d, 0.0)
    cov = jnp.einsum("nk,nki,nkj->nij", w, vij, vij)
    lam, V = geometry.eigh33(cov)
    v1 = V[..., :, 2]
    v3 = V[..., :, 0]
    nvalid = jnp.sum(okn, axis=1)

    def disamb(v):
        dp = jnp.einsum("nki,ni->nk", vij, v)
        plus = jnp.sum((dp >= 0) & okn, axis=1)
        s = 2 * plus - nvalid
        # tie-break: 5 neighbors around the median of the valid ascending-
        # distance list (our k list has self at position 0, so their
        # median index med maps to our position med + 1)
        med = nvalid // 2 + 1
        pos = jnp.clip(med[:, None] - jnp.arange(-2, 3)[None, :], 0, k - 1)
        dpm = jnp.take_along_axis(dp, pos, axis=1)
        tie_flip = jnp.sum(dpm > 0, axis=1) < 3
        flip = (s < 0) | ((s == 0) & tie_flip)
        return jnp.where(flip[:, None], -v, v)

    v1 = disamb(v1)
    v3 = disamb(v3)
    v2 = jnp.cross(v3, v1)

    # --- local coordinates + volume decomposition (shot.hpp:318-365)
    xf = jnp.einsum("nki,ni->nk", vij, v1)
    yf = jnp.einsum("nki,ni->nk", vij, v2)
    zf = jnp.einsum("nki,ni->nk", vij, v3)
    bit4 = ((yf > 0) | ((yf == 0) & (xf < 0))).astype(jnp.int32)
    bit3 = jnp.where((xf > 0) | ((xf == 0) & (yf > 0)), 1 - bit4, bit4)
    desc = (bit4 << 4) + (bit3 << 3)
    cond = (xf * yf > 0) | (xf == 0.0)
    desc = desc + jnp.where(
        cond,
        jnp.where(jnp.abs(xf) >= jnp.abs(yf), 0, 4),
        jnp.where(jnp.abs(xf) > jnp.abs(yf), 4, 0))
    desc = desc + (zf > 0).astype(jnp.int32)
    r12, r14, r34 = radius / 2.0, radius / 4.0, 3.0 * radius / 4.0
    desc = desc + 2 * (d > r12).astype(jnp.int32)
    vol = desc * (nb + 1)

    # --- cosine bin + interpolation (createBinDistanceShape + :366-374)
    cosD = jnp.clip(jnp.einsum("nki,ni->nk", nrm_nbr, v3), -1.0, 1.0)
    binDist = (1.0 + cosD) * nb / 2.0
    step = jnp.floor(binDist + 0.5).astype(jnp.int32)
    frac = binDist - step
    cos_target = jnp.where(frac > 0,
                           vol + (step + 1) % nb,
                           vol + (step - 1 + nb) % nb)
    cos_w = jnp.abs(frac)
    intW = 1.0 - jnp.abs(frac)

    # --- radial interpolation (:376-399)
    outer = d > r12
    rd_out = (d - r34) / r12
    rd_in = (d - r14) / r12
    rad_target = (jnp.where(outer, desc - 2, desc + 2)) * (nb + 1) + step
    rad_w = jnp.where(outer,
                      jnp.where(d > r34, 0.0, -rd_out),
                      jnp.where(d < r14, 0.0, rd_in))
    intW = intW + jnp.where(
        outer,
        jnp.where(d > r34, 1.0 - rd_out, 1.0 + rd_out),
        jnp.where(d < r14, 1.0 + rd_in, 1.0 - rd_in))

    # --- inclination interpolation (:401-427)
    incl = jnp.arccos(jnp.clip(zf / jnp.maximum(d, _EPS), -1.0, 1.0))
    q = jnp.pi / 2.0
    upper = (incl > q) | ((jnp.abs(incl - q) < 1e-30) & (zf <= 0))
    id_up = (incl - 3.0 * jnp.pi / 4.0) / q
    id_lo = (incl - jnp.pi / 4.0) / q
    inc_target = jnp.where(upper, desc + 1, desc - 1) * (nb + 1) + step
    inc_w = jnp.where(upper,
                      jnp.where(incl > 3.0 * jnp.pi / 4.0, 0.0, -id_up),
                      jnp.where(incl < jnp.pi / 4.0, 0.0, id_lo))
    intW = intW + jnp.where(
        upper,
        jnp.where(incl > 3.0 * jnp.pi / 4.0, 1.0 - id_up, 1.0 + id_up),
        jnp.where(incl < jnp.pi / 4.0, 1.0 + id_lo, 1.0 - id_lo))

    # --- azimuth interpolation (:429-456)
    az_on = (yf != 0.0) | (xf != 0.0)
    azim = jnp.arctan2(yf, xf)
    sel = desc >> 2
    azd = (azim - (-jnp.pi * 7.0 / 8.0 + (jnp.pi / 4.0) * sel)) / (jnp.pi / 4.0)
    azd = jnp.clip(azd, -0.5, 0.5)
    az_target = jnp.where(azd > 0,
                          (desc + 4) % 32,
                          (desc - 4 + 32) % 32) * (nb + 1) + step
    az_w = jnp.where(az_on, jnp.abs(azd), 0.0)
    intW = intW + jnp.where(az_on, 1.0 - jnp.abs(azd), 0.0)

    main_target = vol + step
    T = jnp.stack([main_target, cos_target, rad_target, inc_target,
                   az_target], axis=-1)                  # [N,k,5]
    W = jnp.stack([intW, cos_w, rad_w, inc_w, az_w], axis=-1) \
        * okn[..., None]
    T = jnp.clip(T, 0, 351)
    # per-point histogram as a split-one-hot batched matmul: a direct
    # [N,k,5]-indexed scatter-add lowers through a global sort of N*k*5
    # updates (557 of 898 ms/op at the 307k milk frame). With
    # T = hi*32 + lo, hist[hi,lo] = sum_m (W*OH_hi)[m,hi] * OH_lo[m,lo] —
    # N tiny [11,M]@[M,32] MXU matmuls, no sort, no scatter.
    M = T.shape[1] * T.shape[2]
    Tf = T.reshape(nq, M)
    Wf = W.reshape(nq, M)
    oh_hi = jax.nn.one_hot(Tf // 32, 11, dtype=jnp.float32)   # [N,M,11]
    oh_lo = jax.nn.one_hot(Tf % 32, 32, dtype=jnp.float32)    # [N,M,32]
    hist = jnp.einsum("nmh,nml->nhl", oh_hi * Wf[..., None], oh_lo,
                      preferred_element_type=jnp.float32).reshape(nq, 352)
    nrm_h = jnp.maximum(jnp.linalg.norm(hist, axis=-1, keepdims=True), _EPS)
    out = hist / nrm_h
    # fewer than 5 LRF neighbors -> NaN frame in the reference; zero here
    return jnp.where((mask & (nvalid >= 5))[:, None], out, 0.0)


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
