"""2D image keypoint detectors — AGAST/FAST, BRISK, Trajković-Hedley.

Capability match for the reference's keypoint detectors that operate on
image intensities:

- ``agast_keypoints``: pcl::AgastKeypoint2D family (reference: keypoints/
  include/pcl/keypoints/agast_2d.h — AGAST/FAST segment-test corners). The
  reference walks a decision tree per pixel; the TPU re-design evaluates
  the full 16-pixel Bresenham-circle segment test for EVERY pixel at once
  (16 rolled copies of the image), counting the longest contiguous arc of
  brighter/darker pixels with a doubled-mask trick — branch-free, one jit.
- ``brisk_keypoints``: pcl::BriskKeypoint2D (keypoints/include/pcl/
  keypoints/brisk_2d.h) — AGAST scores on a scale pyramid with 3x3 spatial
  + scale non-max suppression.
- ``brisk_descriptor``: the BRISK-like binary descriptor: pairwise
  intensity comparisons on a fixed smoothed sampling pattern
  (common/include/pcl/point_types.hpp BRISKSignature512).
- ``trajkovic_keypoints``: pcl::TrajkovicKeypoint2D (trajkovic_2d.h) —
  min over 4 line directions of opposite-pixel response.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

# 16-pixel Bresenham circle of radius 3 (AGAST/FAST standard ring)
_RING = np.array(
    [
        (0, 3), (1, 3), (2, 2), (3, 1), (3, 0), (3, -1), (2, -2), (1, -3),
        (0, -3), (-1, -3), (-2, -2), (-3, -1), (-3, 0), (-3, 1), (-2, 2), (-1, 3),
    ],
    np.int32,
)


def _ring_stack(img: jax.Array) -> jax.Array:
    """[16,H,W] ring samples via rolls."""
    return jnp.stack(
        [jnp.roll(jnp.roll(img, -dy, 0), -dx, 1) for dy, dx in _RING]
    )


@partial(jax.jit, static_argnames=("arc_length",))
def agast_score(img: jax.Array, threshold: float, arc_length: int = 9) -> jax.Array:
    """[H,W] corner score: number of ring pixels in the longest contiguous
    brighter-or-darker arc if >= arc_length, else 0; magnitude-weighted
    (sum |I_ring - I| over the arc) as the reference's corner score."""
    ring = _ring_stack(img)  # [16,H,W]
    brighter = ring > img[None] + threshold
    darker = ring < img[None] - threshold

    def longest_arc(mask):
        # doubled mask -> max run length up to 16 via prefix scan
        m2 = jnp.concatenate([mask, mask], axis=0).astype(jnp.int32)

        def body(carry, row):
            run = (carry + 1) * row
            return run, run

        _, runs = jax.lax.scan(body, jnp.zeros_like(m2[0]), m2)
        return jnp.minimum(runs.max(axis=0), 16)

    arc_b = longest_arc(brighter)
    arc_d = longest_arc(darker)
    is_corner = (arc_b >= arc_length) | (arc_d >= arc_length)
    mag = jnp.sum(
        jnp.where(brighter | darker, jnp.abs(ring - img[None]) - threshold, 0.0),
        axis=0,
    )
    return jnp.where(is_corner, mag, 0.0)


def _nms3x3(score: jax.Array) -> jax.Array:
    neigh = score
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            neigh = jnp.maximum(neigh, jnp.roll(jnp.roll(score, dy, 0), dx, 1))
    return (score > 0) & (score >= neigh)


@partial(jax.jit, static_argnames=("arc_length",))
def _agast_jit(img, threshold, arc_length):
    s = agast_score(img, threshold, arc_length)
    # suppress the 3-pixel border (ring wraps around via roll)
    H, W = img.shape
    yy = jnp.arange(H)[:, None]
    xx = jnp.arange(W)[None, :]
    border = (yy < 3) | (yy >= H - 3) | (xx < 3) | (xx >= W - 3)
    s = jnp.where(border, 0.0, s)
    return s, _nms3x3(s)


def agast_keypoints(
    img: np.ndarray, threshold: float = 10.0, arc_length: int = 9
) -> np.ndarray:
    """[K,2] (y,x) int32 corner locations after non-max suppression."""
    s, keep = _agast_jit(jnp.asarray(img, jnp.float32), float(threshold), arc_length)
    yy, xx = np.nonzero(np.asarray(keep))
    return np.stack([yy, xx], 1).astype(np.int32)


def brisk_keypoints(
    img: np.ndarray,
    threshold: float = 10.0,
    octaves: int = 3,
    arc_length: int = 9,
) -> np.ndarray:
    """[K,3] (y, x, octave) — AGAST over a half-resolution pyramid with
    per-octave NMS; coordinates in full resolution (brisk_2d.h
    detectKeypoints via BriskScaleSpace)."""
    out = []
    cur = jnp.asarray(img, jnp.float32)
    for o in range(octaves):
        s, keep = _agast_jit(cur, float(threshold), arc_length)
        yy, xx = np.nonzero(np.asarray(keep))
        scale = 1 << o
        out.append(np.stack([yy * scale, xx * scale, np.full_like(yy, o)], 1))
        # 2x2 mean downsample
        H, W = cur.shape
        cur = cur[: H - H % 2, : W - W % 2].reshape(H // 2, 2, W // 2, 2).mean((1, 3))
        if min(cur.shape) < 16:
            break
    return np.concatenate(out).astype(np.int32) if out else np.zeros((0, 3), np.int32)


def _brisk_pattern(n_points: int = 24, seed: int = 5) -> np.ndarray:
    rng = np.random.default_rng(seed)
    r = rng.uniform(2.0, 12.0, n_points)
    th = rng.uniform(0, 2 * np.pi, n_points)
    return np.stack([r * np.sin(th), r * np.cos(th)], 1)  # (dy, dx)


@partial(jax.jit, static_argnames=("n_points",))
def _brisk_desc_jit(img, kps, pattern, n_points):
    sm = img
    # light smoothing (BRISK smooths each sample by its ring sigma)
    for _ in range(2):
        sm = (
            sm
            + jnp.roll(sm, 1, 0) + jnp.roll(sm, -1, 0)
            + jnp.roll(sm, 1, 1) + jnp.roll(sm, -1, 1)
        ) / 5.0
    H, W = img.shape
    pos = kps[:, None, :] + pattern[None, :, :]  # [K,P,2]
    yi = jnp.clip(jnp.round(pos[..., 0]).astype(jnp.int32), 0, H - 1)
    xi = jnp.clip(jnp.round(pos[..., 1]).astype(jnp.int32), 0, W - 1)
    vals = sm[yi, xi]  # [K,P]
    # all short pairs: i<j comparisons -> bits
    iu, ju = np.triu_indices(n_points, 1)
    bits = vals[:, iu] > vals[:, ju]
    return bits


def brisk_descriptor(img: np.ndarray, keypoints: np.ndarray) -> np.ndarray:
    """[K,B] bool binary descriptor (pairwise smoothed-intensity
    comparisons on a fixed radial pattern — BRISKSignature-style)."""
    pattern = jnp.asarray(_brisk_pattern(), jnp.float32)
    bits = _brisk_desc_jit(
        jnp.asarray(img, jnp.float32),
        jnp.asarray(keypoints[:, :2], jnp.float32),
        pattern,
        24,
    )
    return np.asarray(bits)


@jax.jit
def trajkovic_score(img: jax.Array) -> jax.Array:
    """[H,W] score: min over 4 directions of
    (I(p+d)-I(p))^2 + (I(p-d)-I(p))^2 (trajkovic_2d.h operator response)."""
    dirs = [(0, 1), (1, 0), (1, 1), (1, -1)]
    resp = None
    for dy, dx in dirs:
        a = jnp.roll(jnp.roll(img, -dy, 0), -dx, 1)
        b = jnp.roll(jnp.roll(img, dy, 0), dx, 1)
        r = (a - img) ** 2 + (b - img) ** 2
        resp = r if resp is None else jnp.minimum(resp, r)
    return resp


def trajkovic_keypoints(img: np.ndarray, threshold: float = 100.0) -> np.ndarray:
    s = trajkovic_score(jnp.asarray(img, jnp.float32))
    keep = np.array(_nms3x3(jnp.where(s > threshold, s, 0.0)))
    keep[:2, :] = keep[-2:, :] = False
    keep[:, :2] = keep[:, -2:] = False
    yy, xx = np.nonzero(keep)
    return np.stack([yy, xx], 1).astype(np.int32)
