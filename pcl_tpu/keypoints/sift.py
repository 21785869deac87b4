"""SIFT keypoints on point clouds — per-octave scale-space DoG extrema.

Reference-faithful re-design of pcl::SIFTKeypoint (reference:
keypoints/include/pcl/keypoints/sift_keypoint.h:94,
impl/sift_keypoint.hpp:96-330):

- per octave the cloud is CUMULATIVELY voxel-downsampled at leaf = octave
  base scale (hpp:118-131), stopping below 25 points;
- each octave evaluates S+3 Gaussian filter responses
  (sigma_i = base * 2^((i-1)/S)) over one radius neighborhood of
  3*sigma_max with the reference's 9 sigma^2 distance cutoff (hpp:220-250),
  giving an [N, S+2] DoG stack;
- extrema: a point is a keypoint at interior scale i when its DoG value is
  the min/max of its 25-NN neighborhood at scale i AND strictly beyond the
  neighborhood min/max at scales i-1 and i+1, with |DoG| >= min_contrast
  (hpp:259-320).

The octave loop runs on host (cloud sizes shrink dynamically); each
octave's filter/extrema pass is one jitted batched kernel. Keypoints are
centroids of the downsampled octave clouds, exactly like the reference —
``sift_keypoints_cloud`` returns them as a Cloud with a ``scale`` attr;
``sift_keypoints`` keeps the legacy mask-over-input API by snapping each
keypoint to its nearest input point.
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pcl_tpu.core.cloud import Cloud, ATTR_INTENSITY, ATTR_CURVATURE
from pcl_tpu.search import bruteforce


@partial(jax.jit, static_argnames=("scales_per_octave", "cap", "k_extrema"))
def _octave_extrema(xyz, mask, field, base_scale, scales_per_octave: int,
                    min_contrast, cap: int, k_extrema: int):
    """One octave: returns (extremum [N, S+2] bool, per-scale sigma
    [S+2])."""
    S = scales_per_octave
    n = xyz.shape[0]
    sigmas = jnp.asarray(
        [2.0 ** ((i - 1.0) / S) for i in range(S + 3)], jnp.float32
    ) * base_scale                                          # [S+3]
    r_max = 3.0 * sigmas[-1]
    idx, d2, valid, _ = bruteforce.radius(xyz, mask, xyz, r_max, cap=cap)
    idxc = jnp.clip(idx, 0, n - 1)
    valid = valid & mask[:, None]
    fv = field[idxc]                                        # [N,cap]

    def response(sig):
        sig2 = sig * sig
        w = jnp.where(valid & (d2 <= 9.0 * sig2),
                      jnp.exp(-0.5 * d2 / sig2), 0.0)
        return jnp.sum(w * fv, axis=1) / jnp.maximum(jnp.sum(w, axis=1),
                                                     1e-12)

    resp = jnp.stack([response(s) for s in list(sigmas)], axis=1)  # [N,S+3]
    dog = resp[:, 1:] - resp[:, :-1]                        # [N, S+2]

    # 25-NN extremum neighborhoods (hpp:264 fixed k)
    kidx, _kd2, kvalid = bruteforce.knn(xyz, mask, xyz, k_extrema)
    kidxc = jnp.clip(kidx, 0, n - 1)
    kvalid = kvalid & mask[:, None]
    nbr = dog[kidxc]                                        # [N,k,S+2]
    nmin = jnp.min(jnp.where(kvalid[:, :, None], nbr, jnp.inf), axis=1)
    nmax = jnp.max(jnp.where(kvalid[:, :, None], nbr, -jnp.inf), axis=1)

    ns = S + 2
    cols = jnp.arange(ns)
    interior = (cols >= 1) & (cols <= ns - 2)
    prev_min = jnp.concatenate([jnp.full((n, 1), jnp.inf), nmin[:, :-1]], 1)
    next_min = jnp.concatenate([nmin[:, 1:], jnp.full((n, 1), jnp.inf)], 1)
    prev_max = jnp.concatenate([jnp.full((n, 1), -jnp.inf), nmax[:, :-1]], 1)
    next_max = jnp.concatenate([nmax[:, 1:], jnp.full((n, 1), -jnp.inf)], 1)
    contrast = jnp.abs(dog) >= min_contrast
    is_min = (dog == nmin) & (dog < prev_min) & (dog < next_min)
    is_max = (dog == nmax) & (dog > prev_max) & (dog > next_max)
    ext = (contrast & (is_min | is_max) & interior[None, :]
           & mask[:, None])
    return ext, sigmas[: S + 2]


def _field_of(cloud: Cloud, field_attr: Optional[str]):
    if field_attr is not None:
        return cloud.attrs[field_attr]
    if ATTR_INTENSITY in cloud.attrs:
        return cloud.attrs[ATTR_INTENSITY]
    if ATTR_CURVATURE in cloud.attrs:
        return cloud.attrs[ATTR_CURVATURE]
    return cloud.xyz[:, 2]


def sift_keypoints_cloud(
    cloud: Cloud,
    min_scale: float,
    n_octaves: int = 3,
    scales_per_octave: int = 3,
    min_contrast: float = 1e-3,
    field_attr: Optional[str] = None,
    cap: int = 512,
    k_extrema: int = 25,
) -> Cloud:
    """Reference-semantics SIFT: returns a Cloud of keypoints (voxel
    centroids of the octave clouds) with a ``scale`` attribute, in octave
    -then-point order like the reference's output."""
    from pcl_tpu.filters import voxel_downsample

    work = cloud
    scale = float(min_scale)
    out_xyz: List[np.ndarray] = []
    out_scale: List[np.ndarray] = []
    for _o in range(n_octaves):
        ds = voxel_downsample(work, scale)
        n_pts = int(np.asarray(jnp.sum(ds.mask)))
        if n_pts < 25:
            break
        # compact to the valid rows (host slice; centroids are compacted)
        pad = max(n_pts, 32)
        work = Cloud(
            xyz=ds.xyz[:pad], mask=ds.mask[:pad],
            attrs={k: v[:pad] for k, v in ds.attrs.items()})
        field = _field_of(work, field_attr).astype(jnp.float32)
        c = min(cap, pad)
        ext, sigmas = _octave_extrema(
            work.xyz, work.mask, field, jnp.float32(scale),
            scales_per_octave, jnp.float32(min_contrast), c,
            min(k_extrema, pad))
        ext_np = np.asarray(ext)
        sig_np = np.asarray(sigmas)
        pts, sc = np.nonzero(ext_np)
        if len(pts):
            out_xyz.append(np.asarray(work.xyz)[pts])
            out_scale.append(sig_np[sc])
        scale *= 2.0
    if out_xyz:
        kx = np.concatenate(out_xyz).astype(np.float32)
        ks = np.concatenate(out_scale).astype(np.float32)
    else:
        kx = np.zeros((0, 3), np.float32)
        ks = np.zeros((0,), np.float32)
    cap_out = max(len(kx), 1)
    xyz = np.zeros((cap_out, 3), np.float32)
    xyz[: len(kx)] = kx
    sc_arr = np.zeros((cap_out,), np.float32)
    sc_arr[: len(ks)] = ks
    mask = np.zeros((cap_out,), bool)
    mask[: len(kx)] = True
    return Cloud(xyz=jnp.asarray(xyz), mask=jnp.asarray(mask),
                 attrs={"scale": jnp.asarray(sc_arr)})


def sift_keypoints(
    cloud: Cloud,
    min_scale: float,
    n_octaves: int = 3,
    scales_per_octave: int = 3,
    min_contrast: float = 1e-3,
    field: Optional[jax.Array] = None,
    k: int = 32,
) -> Tuple[jax.Array, jax.Array]:
    """Legacy mask API: (keypoint_mask [N], scale [N]). Runs the
    reference-faithful octave pipeline and snaps each keypoint to its
    nearest input point. ``field`` overrides the filtered attribute
    (defaults intensity -> curvature -> z)."""
    work = cloud
    if field is not None:
        work = Cloud(xyz=cloud.xyz, mask=cloud.mask,
                     attrs=dict(cloud.attrs, sift_field=field),
                     width=cloud.width, height=cloud.height)
        kp = sift_keypoints_cloud(work, min_scale, n_octaves,
                                  scales_per_octave, min_contrast,
                                  field_attr="sift_field", )
    else:
        kp = sift_keypoints_cloud(cloud, min_scale, n_octaves,
                                  scales_per_octave, min_contrast)
    n = cloud.capacity
    mask_out = jnp.zeros((n,), bool)
    scale_out = jnp.zeros((n,), jnp.float32)
    if int(np.asarray(jnp.sum(kp.mask))) == 0:
        return mask_out, scale_out
    idx, _d2 = bruteforce.nn1(cloud.xyz, cloud.mask, kp.xyz)
    idx_np = np.asarray(idx)[np.asarray(kp.mask)]
    sc_np = np.asarray(kp.attrs["scale"])[np.asarray(kp.mask)]
    mask_np = np.zeros((n,), bool)
    scale_np = np.zeros((n,), np.float32)
    mask_np[idx_np] = True
    # keep the larger scale when two keypoints snap to one input point
    np.maximum.at(scale_np, idx_np, sc_np)
    return jnp.asarray(mask_np), jnp.asarray(scale_np)
