"""LINEMOD — multimodal template matching on quantized feature maps.

Capability match for pcl::LINEMOD (reference: recognition/include/pcl/
recognition/linemod.h + linemod/line_rgbd.h, color_gradient_modality.h,
surface_normal_modality.h, quantized_map.h, distance_map.h).

Pipeline (faithful to Hinterstoisser et al. as the reference implements it):

1. **Modalities** quantize a dense per-pixel feature into 8 orientation
   bins: color-gradient direction (strong image gradients) and surface-
   normal direction (from an organized depth/xyz frame).
2. **Spreading**: each pixel's quantized bin set is OR-spread over a TxT
   window (the reference's spread quantized map) -> a [H,W,8] bit map.
3. **Templates** store sparse (dx, dy, bin) features sampled from a region
   of a train frame.
4. **Detection** scores every image offset: a template feature hits when
   its bin is present in the spread map at (y+dy, x+dx). The reference
   walks linearized memories serially; the TPU form evaluates ALL offsets
   at once — each template feature contributes one shifted slice of the
   spread map, summed on the MXU-fed VPU (a conv-like reduction under jit).

``line_rgbd_detect`` composes both modalities like pcl::LineRGBD.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_N_BINS = 8


@partial(jax.jit, static_argnames=())
def color_gradient_quantized(rgb: jax.Array, gradient_threshold: float = 10.0):
    """[H,W] int32 bin in [0,8) or -1 below threshold; max-channel Sobel
    gradient direction quantized into 8 half-orientations
    (color_gradient_modality.h computeMaxColoredGradients/quantize)."""
    img = rgb.astype(jnp.float32)
    gx = jnp.zeros(img.shape[:2], jnp.float32)
    gy = jnp.zeros(img.shape[:2], jnp.float32)
    mag = jnp.full(img.shape[:2], -1.0)
    for c in range(img.shape[2]):
        ch = img[..., c]
        cgx = (jnp.roll(ch, -1, 1) - jnp.roll(ch, 1, 1)) * 0.5
        cgy = (jnp.roll(ch, -1, 0) - jnp.roll(ch, 1, 0)) * 0.5
        cmag = cgx * cgx + cgy * cgy
        upd = cmag > mag
        gx = jnp.where(upd, cgx, gx)
        gy = jnp.where(upd, cgy, gy)
        mag = jnp.maximum(mag, cmag)
    ang = jnp.arctan2(gy, gx) % jnp.pi  # undirected orientation
    binno = jnp.floor(ang / jnp.pi * _N_BINS).astype(jnp.int32) % _N_BINS
    return jnp.where(mag > gradient_threshold**2, binno, -1)


@partial(jax.jit, static_argnames=())
def surface_normal_quantized(xyz_img: jax.Array, valid: jax.Array):
    """[H,W] int32 bin in [0,8): in-image-plane normal direction from
    central-difference tangents (surface_normal_modality.h quantization)."""
    dx = (jnp.roll(xyz_img, -1, 1) - jnp.roll(xyz_img, 1, 1)) * 0.5
    dy = (jnp.roll(xyz_img, -1, 0) - jnp.roll(xyz_img, 1, 0)) * 0.5
    n = jnp.cross(dx, dy)
    nn = n / (jnp.linalg.norm(n, axis=-1, keepdims=True) + 1e-12)
    ang = jnp.arctan2(nn[..., 1], nn[..., 0]) % jnp.pi
    binno = jnp.floor(ang / jnp.pi * _N_BINS).astype(jnp.int32) % _N_BINS
    ok = valid & jnp.roll(valid, -1, 1) & jnp.roll(valid, 1, 1)
    ok &= jnp.roll(valid, -1, 0) & jnp.roll(valid, 1, 0)
    return jnp.where(ok, binno, -1)


@partial(jax.jit, static_argnames=("spread",))
def spread_quantized_map(qmap: jax.Array, spread: int = 4) -> jax.Array:
    """[H,W,8] bool: bin present within a spread x spread neighborhood
    (quantized_map.h spreadQuantizedMap)."""
    onehot = jax.nn.one_hot(jnp.clip(qmap, 0, _N_BINS - 1), _N_BINS, dtype=bool)
    onehot &= (qmap >= 0)[..., None]
    out = onehot
    r = spread // 2
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            out |= jnp.roll(jnp.roll(onehot, dy, 0), dx, 1)
    return out


@dataclass
class LinemodTemplate:
    offsets: np.ndarray   # [F,2] int32 (dy, dx) relative to region corner
    bins: np.ndarray      # [F] int32
    modality: np.ndarray  # [F] int32 (0 = gradient, 1 = normal)
    height: int
    width: int


def extract_template(
    qmaps: List[np.ndarray],
    region: Tuple[int, int, int, int],
    n_features: int = 63,
    seed: int = 0,
) -> LinemodTemplate:
    """Sample up to n_features quantized pixels from (y0, x0, h, w) across
    modalities (linemod.h createAndAddTemplate)."""
    y0, x0, h, w = region
    rng = np.random.default_rng(seed)
    offs, bins, mods = [], [], []
    for m, qm in enumerate(qmaps):
        sub = np.asarray(qm[y0 : y0 + h, x0 : x0 + w])
        yy, xx = np.nonzero(sub >= 0)
        if len(yy) == 0:
            continue
        take = min(n_features // len(qmaps) + 1, len(yy))
        sel = rng.choice(len(yy), size=take, replace=False)
        offs.append(np.stack([yy[sel], xx[sel]], 1))
        bins.append(sub[yy[sel], xx[sel]])
        mods.append(np.full(take, m))
    if not offs:
        raise ValueError("no quantizable features in region")
    return LinemodTemplate(
        np.concatenate(offs).astype(np.int32),
        np.concatenate(bins).astype(np.int32),
        np.concatenate(mods).astype(np.int32),
        h,
        w,
    )


@partial(jax.jit, static_argnames=("th", "tw"))
def _score_map(spread_maps: jax.Array, offsets: jax.Array, bins: jax.Array,
               modality: jax.Array, th: int, tw: int) -> jax.Array:
    """[H,W] hit-fraction for a template at every top-left offset.
    spread_maps: [M,H,W,8] bool."""
    H, W = spread_maps.shape[1:3]

    def one_feature(carry, fi):
        acc = carry
        dy, dx = offsets[fi, 0], offsets[fi, 1]
        m = modality[fi]
        b = bins[fi]
        plane = spread_maps[m, :, :, b]
        shifted = jnp.roll(jnp.roll(plane, -dy, 0), -dx, 1)
        return acc + shifted.astype(jnp.float32), None

    acc, _ = jax.lax.scan(
        one_feature, jnp.zeros((H, W), jnp.float32), jnp.arange(offsets.shape[0])
    )
    score = acc / offsets.shape[0]
    # mask offsets where the template would leave the image
    yy = jnp.arange(H)[:, None]
    xx = jnp.arange(W)[None, :]
    ok = (yy <= H - th) & (xx <= W - tw)
    return jnp.where(ok, score, 0.0)


@dataclass
class LinemodDetection:
    y: int
    x: int
    score: float
    template_id: int


def detect_templates(
    spread_maps: List[np.ndarray],
    templates: List[LinemodTemplate],
    threshold: float = 0.8,
    max_detections: int = 8,
) -> List[LinemodDetection]:
    """Score each template at all offsets; greedy non-max suppression over
    half-template-size windows (linemod.h detectTemplates)."""
    sm = jnp.asarray(np.stack(spread_maps))
    out = []
    for tid, t in enumerate(templates):
        score = np.asarray(
            _score_map(
                sm,
                jnp.asarray(t.offsets),
                jnp.asarray(t.bins),
                jnp.asarray(t.modality),
                t.height,
                t.width,
            )
        )
        s = score.copy()
        for _ in range(max_detections):
            yx = np.unravel_index(s.argmax(), s.shape)
            v = s[yx]
            if v < threshold:
                break
            out.append(LinemodDetection(int(yx[0]), int(yx[1]), float(v), tid))
            y0 = max(0, yx[0] - t.height // 2)
            x0 = max(0, yx[1] - t.width // 2)
            s[y0 : yx[0] + t.height // 2 + 1, x0 : yx[1] + t.width // 2 + 1] = 0
    out.sort(key=lambda d: -d.score)
    return out


def line_rgbd_detect(
    rgb: np.ndarray,
    xyz_img: np.ndarray,
    valid: np.ndarray,
    templates: List[LinemodTemplate],
    gradient_threshold: float = 10.0,
    spread: int = 4,
    threshold: float = 0.8,
) -> List[LinemodDetection]:
    """Full LineRGBD path: quantize both modalities, spread, detect."""
    qg = color_gradient_quantized(jnp.asarray(rgb, jnp.float32), gradient_threshold)
    qn = surface_normal_quantized(jnp.asarray(xyz_img, jnp.float32), jnp.asarray(valid))
    sg = np.asarray(spread_quantized_map(qg, spread))
    sn = np.asarray(spread_quantized_map(qn, spread))
    return detect_templates([sg, sn], templates, threshold)


def build_modality_maps(
    rgb: np.ndarray, xyz_img: np.ndarray, valid: np.ndarray,
    gradient_threshold: float = 10.0,
) -> List[np.ndarray]:
    """Quantized (unspread) maps for template extraction."""
    qg = color_gradient_quantized(jnp.asarray(rgb, jnp.float32), gradient_threshold)
    qn = surface_normal_quantized(jnp.asarray(xyz_img, jnp.float32), jnp.asarray(valid))
    return [np.asarray(qg), np.asarray(qn)]
