"""Greedy hypothesis verification (reference: recognition/include/pcl/
recognition/hv/greedy_verification.h): sort hypotheses by scene explanation
score, accept greedily while forbidding already-explained scene points."""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from pcl_tpu.core.transforms import transform_points
from pcl_tpu.search import bruteforce


@partial(jax.jit, static_argnames=())
def greedy_hypothesis_verification(
    model_pts: jax.Array,       # [M,3] model cloud (subsampled)
    transforms: jax.Array,      # [H,4,4] hypothesis poses
    hypothesis_ok: jax.Array,   # [H]
    scene_pts: jax.Array,       # [S,3]
    scene_mask: jax.Array,      # [S]
    inlier_threshold: float = 0.01,
    support_fraction: float = 0.3,
) -> jax.Array:
    """Returns [H] bool acceptance mask."""
    H = transforms.shape[0]
    M = model_pts.shape[0]
    pts = jax.vmap(lambda T: transform_points(T, model_pts))(transforms)
    idx, d2 = bruteforce.nn1(scene_pts, scene_mask, pts.reshape(H * M, 3))
    d2 = d2.reshape(H, M)
    idx = idx.reshape(H, M)
    explained = d2 <= inlier_threshold**2
    support = jnp.mean(explained.astype(jnp.float32), axis=1)
    order = jnp.argsort(-support)

    S = scene_pts.shape[0]

    def step(scene_used, hi):
        e = explained[hi]
        pt = jnp.clip(idx[hi], 0, S - 1)
        # fraction of this hypothesis's explained points NOT already claimed
        fresh = e & ~scene_used[pt]
        frac_fresh = jnp.sum(fresh) / jnp.maximum(jnp.sum(e), 1)
        accept = hypothesis_ok[hi] & (support[hi] >= support_fraction) & (frac_fresh > 0.5)
        scene_used = scene_used | (jnp.zeros_like(scene_used).at[pt].set(fresh) & accept)
        return scene_used, accept

    _, accept_sorted = jax.lax.scan(step, jnp.zeros((S,), bool), order)
    accept = jnp.zeros((H,), bool).at[order].set(accept_sorted)
    return accept
