"""NARF — range-image borders, keypoints, and the 36-d descriptor.

Equivalents of pcl::RangeImageBorderExtractor (reference: features/include/
pcl/features/range_image_border_extractor.h — classify obstacle/shadow/veil
borders from range discontinuities), pcl::NarfKeypoint (keypoints/include/
pcl/keypoints/narf_keypoint.h:60 — interest image combining surface change
and border proximity, then non-max suppression), and pcl::NarfDescriptor
(features/include/pcl/features/narf.h / narf_descriptor.h — star pattern of
beams over the local range patch, 36 values, optionally rotation-invariant
by normalizing against the dominant beam direction).

All three stay on the [H, W] range-image grid: borders and interest are
elementwise stencils, the descriptor a gather of beam samples — no search
structures, ideal for the VPU.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from pcl_tpu.core.range_image import RangeImage

_EPS = 1e-12

# border classes
BORDER_NONE = 0
BORDER_OBSTACLE = 1     # foreground edge (surface ends, big jump behind)
BORDER_SHADOW = 2       # background pixel adjacent to an obstacle border


class BorderDescription(NamedTuple):
    border_type: jax.Array    # [H, W] int32 BORDER_*
    border_score: jax.Array   # [H, W] f32 in [0, 1]


def _shift(img, dr, dc, fill):
    return jnp.roll(jnp.roll(img, dr, axis=0), dc, axis=1) if (dr or dc) else img


def _neighbor(img, dr, dc, fill=jnp.inf):
    out = jnp.full_like(img, fill)
    H, W = img.shape
    rs = slice(max(dr, 0), H + min(dr, 0))
    rd = slice(max(-dr, 0), H + min(-dr, 0))
    cs = slice(max(dc, 0), W + min(dc, 0))
    cd = slice(max(-dc, 0), W + min(-dc, 0))
    return out.at[rd, cd].set(img[rs, cs])


@partial(jax.jit, static_argnames=())
def extract_borders(ri: RangeImage, threshold: float = 0.5) -> BorderDescription:
    """Classify borders from relative range jumps to the 4-neighbors
    (reference range_image_border_extractor.h getNeighborDistanceChangeScore:
    score = 1 - r/r_neighbor clipped to [0,1] for jumps AWAY, i.e. the
    foreground pixel of a discontinuity is the obstacle border)."""
    r = ri.ranges
    observed = jnp.isfinite(r) & (r > 0)
    r_safe = jnp.where(observed, r, jnp.inf)
    score = jnp.zeros_like(r)
    shadow = jnp.zeros_like(r, dtype=bool)
    search = 3   # nearest observed pixel within this many steps (sparse
    # z-buffered images leave unobserved gaps between samples; the
    # reference's border extractor similarly skips unseen pixels)
    for dr, dc in ((0, 1), (0, -1), (1, 0), (-1, 0)):
        rn = jnp.full_like(r, jnp.inf)
        found = jnp.zeros_like(r, dtype=bool)
        for step in range(1, search + 1):
            cand = _neighbor(r_safe, dr * step, dc * step, jnp.inf)
            take = (~found) & jnp.isfinite(cand)
            rn = jnp.where(take, cand, rn)
            found = found | take
        s = jnp.where(found, 1.0 - r_safe / jnp.maximum(rn, _EPS), 0.0)
        score = jnp.maximum(score, jnp.clip(s, 0.0, 1.0))
        # shadow: this pixel is the FAR side of a big jump
        s_back = jnp.where(found, 1.0 - rn / jnp.maximum(r_safe, _EPS), 0.0)
        shadow = shadow | (s_back > threshold)
    score = jnp.where(observed, score, 0.0)
    btype = jnp.where(score > threshold, BORDER_OBSTACLE, BORDER_NONE)
    btype = jnp.where(observed & shadow & (btype == BORDER_NONE),
                      BORDER_SHADOW, btype)
    return BorderDescription(btype.astype(jnp.int32), score)


@partial(jax.jit, static_argnames=("support",))
def narf_interest_image(
    ri: RangeImage,
    support: int = 3,
    border_threshold: float = 0.5,
) -> jax.Array:
    """Interest image [H, W]: surface change (local range curvature)
    modulated by border proximity (reference narf_keypoint.h — principal
    surface change + distance-to-border weighting)."""
    r = ri.ranges
    observed = jnp.isfinite(r) & (r > 0)
    borders = extract_borders(ri, border_threshold)
    r0 = jnp.where(observed, r, 0.0)

    # surface change: second differences in 4 directions, range-normalized,
    # computed only across non-border pixels
    interest = jnp.zeros_like(r)
    for dr, dc in ((0, 1), (1, 0), (1, 1), (1, -1)):
        rp = _neighbor(r0, dr * support, dc * support, 0.0)
        rm = _neighbor(r0, -dr * support, -dc * support, 0.0)
        op = _neighbor(observed, dr * support, dc * support, False)
        om = _neighbor(observed, -dr * support, -dc * support, False)
        ok = observed & op & om
        curv = jnp.abs(rp + rm - 2 * r0) / jnp.maximum(r0, _EPS)
        interest = jnp.maximum(interest, jnp.where(ok, curv, 0.0))
    # borders are maximally interesting; their immediate neighbors inherit
    b = (borders.border_type == BORDER_OBSTACLE).astype(jnp.float32)
    near_b = b
    for dr, dc in ((0, 1), (0, -1), (1, 0), (-1, 0)):
        near_b = jnp.maximum(near_b, 0.7 * _neighbor(b, dr, dc, 0.0))
    interest = jnp.clip(10.0 * interest, 0.0, 1.0)
    interest = jnp.maximum(interest, near_b * borders.border_score)
    return jnp.where(observed, interest, 0.0)


@partial(jax.jit, static_argnames=("max_keypoints", "nms_radius", "support"))
def narf_keypoints(
    ri: RangeImage,
    *,
    max_keypoints: int = 128,
    min_interest: float = 0.45,
    nms_radius: int = 3,
    support: int = 3,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Detect NARF keypoints. Returns (pixel_rc [K,2] int32, interest [K],
    valid [K]) — fixed K = max_keypoints, ranked by interest."""
    interest = narf_interest_image(ri, support)
    # non-max suppression over a (2*nms_radius+1)^2 window
    m = interest
    for dr in range(-nms_radius, nms_radius + 1):
        for dc in range(-nms_radius, nms_radius + 1):
            if dr == 0 and dc == 0:
                continue
            m = jnp.maximum(m, _neighbor(interest, dr, dc, 0.0))
    is_peak = (interest >= m) & (interest >= min_interest)
    score = jnp.where(is_peak, interest, -jnp.inf).reshape(-1)
    H, W = interest.shape
    top = jax.lax.top_k(score, max_keypoints)
    vals, flat = top
    rc = jnp.stack([flat // W, flat % W], axis=-1).astype(jnp.int32)
    valid = jnp.isfinite(vals) & (vals > 0)
    return rc, jnp.where(valid, vals, 0.0), valid


@partial(jax.jit, static_argnames=("n_beams", "patch_radius", "rotation_invariant"))
def narf_descriptors(
    ri: RangeImage,
    pixel_rc: jax.Array,         # [K, 2] keypoint pixels
    *,
    n_beams: int = 36,
    patch_radius: int = 10,
    n_steps: int = 8,
    rotation_invariant: bool = True,
) -> jax.Array:
    """NARF descriptor [K, n_beams] (reference narf.h extractDescriptor —
    each cell is the normalized average range change along one beam of the
    star pattern; rotation invariance by rolling the strongest beam to
    position 0)."""
    r = ri.ranges
    H, W = r.shape
    observed = jnp.isfinite(r) & (r > 0)
    r0 = jnp.where(observed, r, 0.0)

    angles = jnp.arange(n_beams, dtype=jnp.float32) / n_beams * 2 * jnp.pi
    steps = (jnp.arange(n_steps, dtype=jnp.float32) + 1.0) / n_steps * patch_radius
    # beam sample offsets [n_beams, n_steps, 2]
    dr = jnp.sin(angles)[:, None] * steps[None, :]
    dc = jnp.cos(angles)[:, None] * steps[None, :]

    kr = pixel_rc[:, 0].astype(jnp.float32)               # [K]
    kc = pixel_rc[:, 1].astype(jnp.float32)
    sr = jnp.clip((kr[:, None, None] + dr[None]).astype(jnp.int32), 0, H - 1)
    sc = jnp.clip((kc[:, None, None] + dc[None]).astype(jnp.int32), 0, W - 1)
    samp = r0[sr, sc]                                     # [K, n_beams, n_steps]
    samp_ok = observed[sr, sc]
    center = r0[pixel_rc[:, 0], pixel_rc[:, 1]][:, None, None]
    # average signed range change along each beam, range-normalized
    delta = jnp.where(samp_ok, (samp - center) /
                      jnp.maximum(center, _EPS), 0.0)
    cnt = jnp.maximum(jnp.sum(samp_ok, axis=-1), 1)
    desc = jnp.sum(delta, axis=-1) / cnt                  # [K, n_beams]
    # squash like the reference's atan normalization
    desc = jnp.arctan(desc) / (0.5 * jnp.pi)
    if rotation_invariant:
        # roll so the strongest response is beam 0 (unique dominant
        # orientation, the descriptor analog of the reference's
        # rotation-invariant mode)
        shift = jnp.argmax(jnp.abs(desc), axis=-1)
        idx = (jnp.arange(n_beams)[None, :] + shift[:, None]) % n_beams
        desc = jnp.take_along_axis(desc, idx, axis=1)
    return desc
