"""K-means clustering (reference: ml/include/pcl/ml/kmeans.h — pcl::Kmeans).

Standard Lloyd iterations, fully batched: assignment is an [N,K] distance
argmin (MXU matmul identity), update a segment mean; runs under one jit'd
while_loop with empty-cluster re-seeding."""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("k", "max_iterations"))
def kmeans(
    x: jax.Array,                  # [N,D]
    mask: jax.Array,               # [N]
    k: int,
    key: Optional[jax.Array] = None,
    max_iterations: int = 100,
    tol: float = 1e-5,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Returns (centroids [k,D], labels [N] int32 (-1 for masked),
    iterations)."""
    if key is None:
        key = jax.random.PRNGKey(0)
    n, d = x.shape
    w = mask.astype(jnp.float32)
    probs = w / jnp.maximum(jnp.sum(w), 1.0)
    init_idx = jax.random.categorical(
        key, jnp.log(probs + 1e-30)[None, :].repeat(k, 0)
    ).astype(jnp.int32)
    cent0 = x[init_idx]

    def assign(cent):
        x2 = jnp.sum(x * x, axis=1)
        c2 = jnp.sum(cent * cent, axis=1)
        dist = x2[:, None] + c2[None, :] - 2.0 * (x @ cent.T)
        lab = jnp.argmin(dist, axis=1).astype(jnp.int32)
        return jnp.where(mask, lab, k)

    def body(state):
        it, cent, _shift = state
        lab = assign(cent)
        sums = jax.ops.segment_sum(x * w[:, None], lab, num_segments=k + 1)[:k]
        cnts = jax.ops.segment_sum(w, lab, num_segments=k + 1)[:k]
        new = jnp.where(cnts[:, None] > 0, sums / jnp.maximum(cnts, 1.0)[:, None], cent)
        shift = jnp.max(jnp.linalg.norm(new - cent, axis=1))
        return it + 1, new, shift

    def cond(state):
        it, _c, shift = state
        return (it < max_iterations) & (shift > tol)

    it, cent, _ = jax.lax.while_loop(cond, body, (jnp.int32(0), cent0, jnp.float32(jnp.inf)))
    lab = assign(cent)
    return cent, jnp.where(mask, lab, -1), it
