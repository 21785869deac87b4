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


@partial(jax.jit, static_argnames=("max_moves",))
def global_hypothesis_verification(
    model_pts: jax.Array,       # [M,3] model cloud (subsampled)
    transforms: jax.Array,      # [H,4,4] hypothesis poses
    hypothesis_ok: jax.Array,   # [H]
    scene_pts: jax.Array,       # [S,3]
    scene_mask: jax.Array,      # [S]
    inlier_threshold: float = 0.01,
    regularizer: float = 3.0,
    clutter_regularizer: float = 5.0,
    clutter_radius: float = 0.03,
    max_moves: int = 64,
) -> jax.Array:
    """Global-optimization hypothesis verification — the capability of
    pcl::GlobalHypothesesVerification (reference: recognition/include/pcl/
    recognition/hv/hv_go.h). The reference minimizes a global cost

        -explained(active) + regularizer * duplicity(active)
        + clutter_regularizer * unexplained_in_neighborhood(active)
        + model outliers

    over the {0,1}^H activation vector with a metaheuristic (mets SA /
    tabu over single-bit moves). TPU re-design, not a port: the cost is
    expressed through per-(hypothesis, scene-point) explanation matrices so
    that ALL H single-bit flips are evaluated in one batched pass per move;
    the move loop is a lax.while_loop that flips the best-improving bit
    until no flip improves (deterministic steepest-descent over the same
    move set; starts all-off like the reference's initial solution).

    Returns [H] bool acceptance mask.
    """
    H = transforms.shape[0]
    M = model_pts.shape[0]
    S = scene_pts.shape[0]
    pts = jax.vmap(lambda T: transform_points(T, model_pts))(transforms)

    # per-hypothesis explanation of scene points: scene point s is explained
    # by hypothesis h iff its nearest model point of h is within threshold.
    # (The reference accumulates model->scene NN; with subsampled models the
    # scene->model direction gives the same explained set in matrix form.)
    flat = pts.reshape(H * M, 3)
    fmask = jnp.ones((H * M,), bool)

    # distances scene -> each hypothesis's model (batched over hypotheses)
    def scene_to_model(h):
        idx, d2 = bruteforce.nn1(pts[h], jnp.ones((M,), bool), scene_pts)
        return d2                                   # [S]

    d2_sm = jax.vmap(scene_to_model)(jnp.arange(H))  # [H,S]
    thr2 = inlier_threshold ** 2
    w_explain = jnp.where(scene_mask[None, :] & (d2_sm <= thr2),
                          1.0 - d2_sm / thr2, 0.0)   # [H,S] weighted explanation
    explained_h = d2_sm <= thr2                      # [H,S]
    # clutter: scene points NEAR a hypothesis (within clutter_radius) but
    # not explained by it (hv_go unexplained_in_neighborhood)
    near_h = d2_sm <= clutter_radius ** 2
    clutter_h = (near_h & ~explained_h & scene_mask[None, :]).astype(jnp.float32)

    # model outliers: fraction of the hypothesis's model points with no
    # scene support
    midx, md2 = bruteforce.nn1(scene_pts, scene_mask, flat)
    outlier_h = jnp.mean((md2.reshape(H, M) > thr2).astype(jnp.float32), axis=1)

    big_penalty = jnp.where(hypothesis_ok, 0.0, 1e6)

    def cost(active):
        a = active.astype(jnp.float32)               # [H]
        # times each scene point is explained by active hypotheses
        n_exp = a @ explained_h.astype(jnp.float32)  # [S]
        # explained value counts each point once (best explainer)
        best_w = jnp.max(jnp.where(active[:, None], w_explain, 0.0), axis=0)
        explained_val = jnp.sum(best_w)
        duplicity = jnp.sum(jnp.maximum(n_exp - 1.0, 0.0))
        clutter = a @ jnp.sum(clutter_h, axis=1)
        outliers = a @ outlier_h * M
        return (-explained_val + regularizer * duplicity
                + clutter_regularizer * clutter * 0.01
                + outliers * 0.05 + a @ big_penalty)

    def flip_all(active):
        """Cost of flipping each bit, evaluated in one vmapped pass."""
        def flipped(h):
            return cost(active.at[h].set(~active[h]))
        return jax.vmap(flipped)(jnp.arange(H))

    def body(state):
        active, cur, moves, _done = state
        cand = flip_all(active)                      # [H]
        best = jnp.argmin(cand)
        improve = cand[best] < cur - 1e-6
        active = jnp.where(improve, active.at[best].set(~active[best]), active)
        cur = jnp.where(improve, cand[best], cur)
        return active, cur, moves + 1, ~improve

    def cond(state):
        _active, _cur, moves, done = state
        return (moves < max_moves) & (~done)

    active0 = jnp.zeros((H,), bool)
    active, _, _, _ = jax.lax.while_loop(
        cond, body, (active0, cost(active0), jnp.int32(0), False))
    return active & hypothesis_ok


@partial(jax.jit, static_argnames=())
def papazov_hypothesis_verification(
    model_pts: jax.Array,       # [M,3] model cloud (subsampled)
    transforms: jax.Array,      # [H,4,4] hypothesis poses
    hypothesis_ok: jax.Array,   # [H]
    scene_pts: jax.Array,       # [S,3]
    scene_mask: jax.Array,      # [S]
    inlier_threshold: float = 0.01,
    support_threshold: float = 0.1,
    penalty_threshold: float = 0.1,
) -> jax.Array:
    """Papazov-style conservative hypothesis filtering (reference:
    recognition/include/pcl/recognition/hv/hv_papazov.h, defaults :98-99):
    accept a hypothesis iff its visible-support fraction (model points
    explained by the scene) is >= support_threshold AND its penalty
    fraction (model points that project in front of / away from the scene
    — outliers) is <= penalty_threshold. Per-hypothesis independent — one
    batched NN sweep decides all H at once. Returns [H] bool."""
    H = transforms.shape[0]
    M = model_pts.shape[0]
    pts = jax.vmap(lambda T: transform_points(T, model_pts))(transforms)
    _idx, d2 = bruteforce.nn1(scene_pts, scene_mask, pts.reshape(H * M, 3))
    d2 = d2.reshape(H, M)
    explained = d2 <= inlier_threshold ** 2
    support = jnp.mean(explained.astype(jnp.float32), axis=1)
    penalty = jnp.mean((d2 > (2.0 * inlier_threshold) ** 2).astype(jnp.float32),
                       axis=1)
    return hypothesis_ok & (support >= support_threshold) \
        & (penalty <= penalty_threshold)
