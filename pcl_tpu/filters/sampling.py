"""Subsampling filters: random, farthest-point, normal-space.

References: filters/include/pcl/filters/random_sample.h,
farthest_point_sampling.h, normal_space.h. UniformSampling lives in
voxel_grid.py (it shares the segment machinery).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from pcl_tpu.core.cloud import Cloud


@partial(jax.jit, static_argnames=("n_samples",))
def random_sample(cloud: Cloud, n_samples: int, key: jax.Array) -> Cloud:
    """Uniformly sample up to n_samples valid points without replacement."""
    n = cloud.capacity
    z = jax.random.uniform(key, (n,))
    # invalid points get score 2.0 so they sort last
    score = jnp.where(cloud.mask, z, 2.0)
    order = jnp.argsort(score)
    sel = order[:n_samples]
    lane = jnp.arange(n_samples)
    valid = lane < cloud.count
    return cloud.take(sel, valid=valid)


@partial(jax.jit, static_argnames=("n_samples",))
def farthest_point_sample(cloud: Cloud, n_samples: int, key: jax.Array) -> Cloud:
    """Iterative farthest-point sampling (reference:
    filters/include/pcl/filters/farthest_point_sampling.h). O(n_samples * N)
    masked distance updates, fully on device."""
    n = cloud.capacity
    xyz = cloud.xyz
    big = jnp.float32(jnp.inf)
    start = jax.random.choice(key, n, p=cloud.mask / jnp.maximum(cloud.count, 1))

    def body(i, carry):
        mind, sel = carry
        last = sel[i - 1]
        d = jnp.sum((xyz - xyz[last]) ** 2, axis=-1)
        mind = jnp.minimum(mind, d)
        mind_masked = jnp.where(cloud.mask, mind, -big)
        nxt = jnp.argmax(mind_masked)
        sel = sel.at[i].set(nxt.astype(jnp.int32))
        return mind, sel

    sel0 = jnp.zeros((n_samples,), jnp.int32).at[0].set(start.astype(jnp.int32))
    _, sel = jax.lax.fori_loop(1, n_samples, body, (jnp.full((n,), big), sel0))
    lane = jnp.arange(n_samples)
    valid = lane < jnp.minimum(cloud.count, n_samples)
    return cloud.take(sel, valid=valid)


@partial(jax.jit, static_argnames=("n_samples", "bins_per_axis"))
def normal_space_sample(
    cloud: Cloud, n_samples: int, key: jax.Array, bins_per_axis: int = 4
) -> Cloud:
    """Sample evenly over the normal-direction histogram (reference:
    filters/include/pcl/filters/normal_space.h). Requires a 'normal' attr."""
    nrm = cloud.attrs["normal"]
    b = bins_per_axis
    q = jnp.clip(((nrm * 0.5 + 0.5) * b).astype(jnp.int32), 0, b - 1)
    bin_id = (q[:, 0] * b + q[:, 1]) * b + q[:, 2]
    n_bins = b ** 3
    # round-robin over bins: rank within bin, then sort by (rank, random)
    z = jax.random.uniform(key, (cloud.capacity,))
    order = jnp.lexsort((z, bin_id))
    sorted_bin = bin_id[order]
    first = jnp.concatenate([jnp.array([True]), sorted_bin[1:] != sorted_bin[:-1]])
    pos = jnp.arange(cloud.capacity)
    seg_start = jnp.where(first, pos, 0)
    seg_start = jax.lax.associative_scan(jnp.maximum, seg_start)
    rank = pos - seg_start
    score = jnp.where(cloud.mask[order], rank.astype(jnp.float32) + z * 0.5, jnp.inf)
    pick = jnp.argsort(score)[:n_samples]
    sel = order[pick]
    lane = jnp.arange(n_samples)
    valid = lane < jnp.minimum(cloud.count, n_samples)
    return cloud.take(sel, valid=valid)
