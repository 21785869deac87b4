"""Pyramid feature histogram matching.

Equivalent of pcl::PyramidFeatureHistogram (reference: registration/include/
pcl/registration/pyramid_feature_matching.h:68 — Grauman & Darrell pyramid
match kernel over feature histograms). Feature vectors are binned at L
resolutions (bin size doubling per level); similarity between two pyramids
is the weighted sum of NEW matches per level, normalized by the
self-similarities.

TPU design: instead of the reference's per-level sparse histogram maps,
each level scatters into a fixed-size hashed dense table — every level is
one segment-sum, comparison one elementwise min + reduction.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp


class FeaturePyramid(NamedTuple):
    tables: jax.Array       # [L, T] f32 hashed histogram per level
    n_features: jax.Array   # f32 total feature count
    n_levels: int
    n_dims: int


_PRIMES = jnp.asarray(
    [73856093, 19349663, 83492791, 49979687, 86028121, 15485863,
     32452843, 67867967, 49979693, 67867979, 86028157, 15485917,
     104395301, 122949823, 141650939, 160481183], dtype=jnp.uint32)


def _hash_bins(bins: jax.Array, table_size: int) -> jax.Array:
    """[N, D] int bins -> [N] hashed table slot (multiplicative XOR hash)."""
    d = bins.shape[-1]
    primes = _PRIMES[:d] if d <= 16 else jnp.concatenate(
        [_PRIMES, jnp.arange(17, d + 1, dtype=jnp.uint32) * jnp.uint32(2654435761)])[:d]
    h = jnp.zeros(bins.shape[:-1], jnp.uint32)
    hb = bins.astype(jnp.uint32) * primes
    for i in range(d):
        h = h ^ hb[..., i]
    return (h % jnp.uint32(table_size)).astype(jnp.int32)


@partial(jax.jit, static_argnames=("n_levels", "table_size"))
def build_pyramid(
    features: jax.Array,
    mask: jax.Array,
    ranges: jax.Array,
    *,
    n_levels: int = 6,
    table_size: int = 4096,
) -> FeaturePyramid:
    """Build the L-level histogram pyramid of masked ``features`` [N, D].

    ``ranges`` [D, 2] gives the (min, max) of each dimension; level 0 uses
    bin size (max-min)/2^(L-1), doubling per level (matching the reference's
    bins-per-dimension halving as the level coarsens)."""
    n, d = features.shape
    lo = ranges[:, 0]
    span = jnp.maximum(ranges[:, 1] - ranges[:, 0], 1e-12)
    w = mask.astype(jnp.float32)
    tables = []
    for level in range(n_levels):
        n_bins = max(1, 2 ** (n_levels - 1 - level))
        rel = jnp.clip((features - lo) / span, 0.0, 1.0 - 1e-7)
        bins = jnp.floor(rel * n_bins).astype(jnp.int32)
        slots = _hash_bins(bins, table_size)
        tables.append(jnp.zeros((table_size,), jnp.float32).at[slots].add(w))
    return FeaturePyramid(
        tables=jnp.stack(tables),
        n_features=jnp.sum(w),
        n_levels=n_levels,
        n_dims=d,
    )


def _raw_match(a: FeaturePyramid, b: FeaturePyramid) -> jax.Array:
    """Pyramid match kernel: sum over levels of weight * NEW matches."""
    inter = jnp.sum(jnp.minimum(a.tables, b.tables), axis=-1)   # [L]
    # new matches at level l = I_l - I_{l-1}; weight halves as bins coarsen
    new = inter - jnp.concatenate([jnp.zeros((1,)), inter[:-1]])
    weights = 0.5 ** jnp.arange(a.n_levels, dtype=jnp.float32)[::-1]
    # finest level (index L-1 here is the COARSEST: bins halve with level) —
    # level 0 has the most bins -> weight 1, halving as bins double in size
    weights = 0.5 ** jnp.arange(a.n_levels, dtype=jnp.float32)
    return jnp.sum(weights * new)


def compare_pyramids(a: FeaturePyramid, b: FeaturePyramid) -> jax.Array:
    """Normalized pyramid match similarity in [0, 1] (reference:
    PyramidFeatureHistogram::comparePyramidFeatureHistograms)."""
    m = _raw_match(a, b)
    sa = _raw_match(a, a)
    sb = _raw_match(b, b)
    return m / jnp.maximum(jnp.sqrt(sa * sb), 1e-12)
