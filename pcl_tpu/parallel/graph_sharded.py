"""Distributed pose-graph solve — LUM edges sharded over the device mesh.

The north-star config 4 scale-out (SURVEY §3.4: "the 6Vx6V solve is the
distributed Schur-complement / CG target"): edge correspondence sets — the
big tensors, [E,C,3] — are sharded across devices; poses [V,4,4] and the CG
state [V,6] stay replicated. Each Gauss-Newton iteration:

  per-shard edge blocks (local einsums over the shard's correspondences)
  -> psum-assembled gradient + block diagonal          (one [V,6]+[V,6,6] psum)
  -> block-Jacobi CG where each matvec is local edge products + ONE psum
     of the [V,6] result over ICI
  -> replicated pose update.

Communication per GN step: (cg_iters + 2) psums of ~6V floats — independent
of correspondence count. Compare the reference's single-machine dense
factorization (impl/lum.hpp:266).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pcl_tpu.core.transforms import se3_exp
from pcl_tpu.parallel.mesh import POINTS_AXIS
from pcl_tpu.registration.graph import _edge_system, PoseGraphResult


def sharded_lum(
    mesh: Mesh,
    poses,            # [V,4,4] initial absolute poses (host or device)
    edge_src,         # [E] int32
    edge_dst,         # [E] int32
    corr_src,         # [E,C,3]
    corr_dst,         # [E,C,3]
    corr_valid,       # [E,C] bool
    *,
    max_iterations: int = 5,
    damping: float = 1e-6,
    cg_iters: int = 48,
    axis: str = POINTS_AXIS,
) -> PoseGraphResult:
    """LUM global alignment with edges sharded over ``mesh``; returns
    replicated optimized poses. Pads E up to a multiple of the mesh size
    (padding edges carry zero valid correspondences — exact no-ops)."""
    n_dev = mesh.shape[axis]
    E = int(np.asarray(edge_src).shape[0])
    pad = (-E) % n_dev
    if pad:
        edge_src = jnp.concatenate([jnp.asarray(edge_src), jnp.zeros(pad, jnp.int32)])
        edge_dst = jnp.concatenate([jnp.asarray(edge_dst), jnp.zeros(pad, jnp.int32)])
        corr_src = jnp.concatenate(
            [jnp.asarray(corr_src), jnp.zeros((pad,) + tuple(corr_src.shape[1:]), jnp.float32)])
        corr_dst = jnp.concatenate(
            [jnp.asarray(corr_dst), jnp.zeros((pad,) + tuple(corr_dst.shape[1:]), jnp.float32)])
        corr_valid = jnp.concatenate(
            [jnp.asarray(corr_valid), jnp.zeros((pad, corr_valid.shape[1]), bool)])

    V = poses.shape[0]

    def body(P0, es, ed, cs, cd, cv):
        def gn_iteration(it, P):
            H_ii, H_jj, H_ij, g_i, g_j, _res = _edge_system(P, es, ed, cs, cd, cv)

            g = jnp.zeros((V, 6), jnp.float32)
            g = g.at[es].add(g_i)
            g = g.at[ed].add(g_j)
            g = jax.lax.psum(g, axis)

            D = jnp.zeros((V, 6, 6), jnp.float32)
            D = D.at[es].add(H_ii)
            D = D.at[ed].add(H_jj)
            D = jax.lax.psum(D, axis)

            tr = jnp.einsum("vaa->", D) / (6.0 * V)
            prior = jnp.concatenate(
                [jnp.full((1, 6), 1e12), jnp.zeros((V - 1, 6))], axis=0)
            damp = damping * (tr + 1.0)

            def matvec(x):
                xi = x[es]
                xj = x[ed]
                yi = (jnp.einsum("eab,eb->ea", H_ii, xi)
                      + jnp.einsum("eab,eb->ea", H_ij, xj))
                yj = (jnp.einsum("eba,eb->ea", H_ij, xi)
                      + jnp.einsum("eab,eb->ea", H_jj, xj))
                y = jnp.zeros_like(x)
                y = y.at[es].add(yi)
                y = y.at[ed].add(yj)
                # the ONE collective per CG step: [V,6] over ICI
                y = jax.lax.psum(y, axis)
                return y + (prior + damp) * x

            Minv = jnp.linalg.inv(D + jax.vmap(jnp.diag)(prior + damp))

            def prec(v):
                return jnp.einsum("vab,vb->va", Minv, v)

            b = g
            x = jnp.zeros_like(b)
            r = b
            z = prec(r)
            p = z
            rz = jnp.sum(r * z)

            def cg_body(i, carry):
                x, r, p, rz = carry
                Ap = matvec(p)
                alpha = rz / jnp.maximum(jnp.sum(p * Ap), 1e-30)
                x = x + alpha * p
                r = r - alpha * Ap
                z = prec(r)
                rz_new = jnp.sum(r * z)
                beta = rz_new / jnp.maximum(rz, 1e-30)
                return x, r, z + beta * p, rz_new

            x, _r, _p, _ = jax.lax.fori_loop(0, cg_iters, cg_body, (x, r, p, rz))
            dx = -x
            return jax.vmap(lambda xi, T: se3_exp(xi) @ T)(dx, P)

        P = jax.lax.fori_loop(0, max_iterations, gn_iteration, P0)
        # final residual for reporting
        *_blocks, res_local = _edge_system(P, es, ed, cs, cd, cv)
        w = cv.astype(jnp.float32)
        sw = jax.lax.psum(jnp.sum(w), axis)
        sse = jax.lax.psum(res_local * jnp.maximum(jnp.sum(w), 1.0), axis)
        return P, sse / jnp.maximum(sw, 1.0)

    spec_e = P(axis)
    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), spec_e, spec_e, P(axis, None, None), P(axis, None, None),
                  P(axis, None)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    sh_e = NamedSharding(mesh, P(axis))
    Pout, res = jax.jit(fn)(
        jnp.asarray(poses, jnp.float32),
        jax.device_put(jnp.asarray(edge_src), sh_e),
        jax.device_put(jnp.asarray(edge_dst), sh_e),
        jax.device_put(jnp.asarray(corr_src), NamedSharding(mesh, P(axis, None, None))),
        jax.device_put(jnp.asarray(corr_dst), NamedSharding(mesh, P(axis, None, None))),
        jax.device_put(jnp.asarray(corr_valid), NamedSharding(mesh, P(axis, None))),
    )
    return PoseGraphResult(poses=Pout, iterations=jnp.int32(max_iterations),
                           residual=res)
