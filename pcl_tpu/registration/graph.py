"""Pose-graph optimization — LUM-style global alignment + ELCH loop closing.

TPU-native re-designs of:

- pcl::registration::LUM (reference: registration/include/pcl/registration/
  lum.h:108-129; impl/lum.hpp:221-272 solve, :308-443 computeEdge). The
  reference builds, per edge, a 6x6 information matrix + residual from
  correspondence statistics, assembles a dense 6Vx6V system and solves it
  with colPivHouseholderQr per iteration. Here the SAME graph problem is
  solved as batched Gauss-Newton on se(3) twists: every edge's
  correspondences live in padded [E, C, 3] tensors, residuals/Jacobian
  blocks are one einsum, the 6Vx6V normal system is scatter-assembled and
  solved on device, vertex 0 is gauge-fixed. (PCL parameterizes by Euler
  angles and linearizes around them; twists are the standard well-behaved
  choice on accelerators.)

- pcl::registration::ELCH (reference: elch.h:59-75; impl/elch.hpp:56,
  216-237 loopOptimizerAlgorithm): after a loop closure transform is
  estimated between loop ends, the correction is distributed over the chain
  with per-vertex weights; here weights are the normalized chain position
  and the correction is interpolated in the Lie algebra.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from pcl_tpu.core.transforms import se3_exp, se3_log, transform_points
from pcl_tpu.registration.gicp import _skew


class PoseGraphResult(NamedTuple):
    poses: jax.Array        # [V,4,4] optimized absolute poses
    iterations: jax.Array   # int32
    residual: jax.Array     # f32 final mean squared edge residual


@partial(jax.jit, static_argnames=("max_iterations",))
def lum(
    poses: jax.Array,          # [V,4,4] initial absolute poses
    edge_src: jax.Array,       # [E] int32 vertex index i per edge
    edge_dst: jax.Array,       # [E] int32 vertex index j per edge
    corr_src: jax.Array,       # [E,C,3] points in frame i
    corr_dst: jax.Array,       # [E,C,3] corresponding points in frame j
    corr_valid: jax.Array,     # [E,C] bool
    *,
    max_iterations: int = 5,
    convergence_threshold: float = 0.0,
    damping: float = 1e-6,
) -> PoseGraphResult:
    """Globally consistent alignment of V scans from inter-scan
    correspondences (the LUM graph problem; tools/lum.cpp pipeline).

    Minimizes sum_edges sum_k || T_i p_k - T_j q_k ||^2 over all poses,
    with pose 0 held fixed.
    """
    V = poses.shape[0]
    E = edge_src.shape[0]

    I3 = jnp.eye(3, dtype=jnp.float32)

    def gn_iteration(carry):
        it, P, _res = carry
        Ti = P[edge_src]                        # [E,4,4]
        Tj = P[edge_dst]
        pw = jax.vmap(transform_points)(Ti, corr_src)     # [E,C,3]
        qw = jax.vmap(transform_points)(Tj, corr_dst)
        w = corr_valid.astype(jnp.float32)
        r = pw - qw                                       # [E,C,3]

        # d r / d xi_i = [I | -[pw]x],  d r / d xi_j = -[I | -[qw]x]
        # (twist = (rho, omega), left perturbation exp(xi) T)
        Ji = jnp.concatenate(
            [jnp.broadcast_to(I3, pw.shape[:2] + (3, 3)), -_skew(pw)], axis=-1
        )                                                  # [E,C,3,6]
        Jj = -jnp.concatenate(
            [jnp.broadcast_to(I3, qw.shape[:2] + (3, 3)), -_skew(qw)], axis=-1
        )
        H_ii = jnp.einsum("ec,ecka,eckb->eab", w, Ji, Ji)  # [E,6,6]
        H_jj = jnp.einsum("ec,ecka,eckb->eab", w, Jj, Jj)
        H_ij = jnp.einsum("ec,ecka,eckb->eab", w, Ji, Jj)
        g_i = jnp.einsum("ec,ecka,eck->ea", w, Ji, r)      # [E,6]
        g_j = jnp.einsum("ec,ecka,eck->ea", w, Jj, r)

        # scatter-assemble the 6V x 6V system
        H = jnp.zeros((V, V, 6, 6), jnp.float32)
        H = H.at[edge_src, edge_src].add(H_ii)
        H = H.at[edge_dst, edge_dst].add(H_jj)
        H = H.at[edge_src, edge_dst].add(H_ij)
        H = H.at[edge_dst, edge_src].add(jnp.swapaxes(H_ij, -1, -2))
        g = jnp.zeros((V, 6), jnp.float32)
        g = g.at[edge_src].add(g_i)
        g = g.at[edge_dst].add(g_j)

        Hf = H.transpose(0, 2, 1, 3).reshape(6 * V, 6 * V)
        gf = g.reshape(6 * V)
        # gauge fix vertex 0: huge diagonal prior
        prior = jnp.concatenate([jnp.full((6,), 1e12), jnp.zeros(6 * (V - 1))])
        Hf = Hf + jnp.diag(prior + damping * (jnp.trace(Hf) / (6 * V) + 1.0))
        dx = -jnp.linalg.solve(Hf, gf).reshape(V, 6)
        P_new = jax.vmap(lambda xi, T: se3_exp(xi) @ T)(dx, P)
        res = jnp.sum(w * jnp.sum(r * r, axis=-1)) / jnp.maximum(jnp.sum(w), 1.0)
        return it + 1, P_new, res

    def cond(carry):
        it, _P, res = carry
        return (it < max_iterations) & (res > convergence_threshold)

    it, P, res = jax.lax.while_loop(
        cond, gn_iteration, (jnp.int32(0), poses.astype(jnp.float32),
                             jnp.float32(jnp.inf))
    )
    return PoseGraphResult(poses=P, iterations=it, residual=res)


@jax.jit
def elch_distribute(
    poses: jax.Array,         # [V,4,4] chain poses (0 .. V-1 along the loop)
    loop_transform: jax.Array  # [4,4] correction aligning scan V-1 onto scan 0's frame
) -> jax.Array:
    """Distribute a loop-closure correction over the chain (reference:
    elch.hpp loopOptimizerAlgorithm — graph-distance weighting; here the
    chain-position fraction in the Lie algebra)."""
    V = poses.shape[0]
    xi = se3_log(loop_transform)
    wgt = jnp.arange(V, dtype=jnp.float32) / jnp.maximum(V - 1.0, 1.0)   # 0..1
    corr = jax.vmap(lambda a: se3_exp(a * xi))(wgt)                       # [V,4,4]
    return jnp.einsum("vij,vjk->vik", corr, poses)


def build_edges_from_correspondences(pairs, max_corr: int):
    """Host helper: list of (i, j, src_pts [C_e,3], dst_pts [C_e,3]) ->
    padded device arrays for lum(). Returns (edge_src, edge_dst, corr_src,
    corr_dst, corr_valid)."""
    import numpy as np
    E = len(pairs)
    es = np.zeros(E, np.int32)
    ed = np.zeros(E, np.int32)
    cs = np.zeros((E, max_corr, 3), np.float32)
    cd = np.zeros((E, max_corr, 3), np.float32)
    cv = np.zeros((E, max_corr), bool)
    for e, (i, j, s, d) in enumerate(pairs):
        c = min(len(s), max_corr)
        es[e], ed[e] = i, j
        cs[e, :c] = np.asarray(s)[:c]
        cd[e, :c] = np.asarray(d)[:c]
        cv[e, :c] = True
    return (jnp.asarray(es), jnp.asarray(ed), jnp.asarray(cs),
            jnp.asarray(cd), jnp.asarray(cv))
