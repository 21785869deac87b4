"""HOG features (reference: people/include/pcl/people/hog.h — the
Dalal-Triggs histogram-of-oriented-gradients used by the people detector).
Batched: gradients via convolution, orientation binning via one-hot
accumulation over cells, block normalization vectorized.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("cell_size", "n_bins", "block_size"))
def hog_features(
    img: jax.Array,            # [H,W] grayscale f32
    cell_size: int = 8,
    n_bins: int = 9,
    block_size: int = 2,
) -> jax.Array:
    """[(H//cell - block + 1) * (W//cell - block + 1), block^2 * n_bins]
    L2-normalized block descriptors."""
    H, W = img.shape
    gx = jnp.roll(img, -1, 1) - jnp.roll(img, 1, 1)
    gy = jnp.roll(img, -1, 0) - jnp.roll(img, 1, 0)
    mag = jnp.sqrt(gx * gx + gy * gy)
    ang = jnp.mod(jnp.arctan2(gy, gx), jnp.pi)       # unsigned [0, pi)
    b = jnp.clip((ang / jnp.pi * n_bins).astype(jnp.int32), 0, n_bins - 1)

    ch, cw = H // cell_size, W // cell_size
    yy = jnp.arange(H) // cell_size
    xx = jnp.arange(W) // cell_size
    cell_id = yy[:, None] * cw + xx[None, :]
    flat_idx = cell_id * n_bins + b
    hist = jax.ops.segment_sum(
        mag.reshape(-1), flat_idx.reshape(-1), num_segments=ch * cw * n_bins
    ).reshape(ch, cw, n_bins)

    # blocks of block_size x block_size cells with L2 normalization
    bh = ch - block_size + 1
    bw = cw - block_size + 1
    blocks = []
    for dy in range(block_size):
        for dx in range(block_size):
            blocks.append(hist[dy:dy + bh, dx:dx + bw])
    blk = jnp.concatenate(blocks, axis=-1)           # [bh,bw,block^2*n_bins]
    norm = jnp.maximum(jnp.linalg.norm(blk, axis=-1, keepdims=True), 1e-6)
    return (blk / norm).reshape(bh * bw, -1)
