"""Multi-chip NDT: source points sharded, psum'd Newton system.

Distributed form of registration/ndt.py (reference:
pcl::NormalDistributionsTransform, registration/include/pcl/registration/
ndt.h:75, hot loop impl/ndt.hpp:131-170) — VERDICT r4 #4a. Layout:

- source shard [N/D, 3] per device over the ``points`` (dp) axis;
- target replicated; the voxel-Gaussian grid (VoxelGridCovariance
  equivalent, registration.ndt.build_grid) is built REDUNDANTLY on every
  device from the replicated target — identical result, zero
  communication, exactly the gicp_sharded covariance strategy;
- each Newton iteration: every shard runs the analytic one-pass
  score/gradient/Hessian (ndt.hpp:211) over ITS points against the local
  grid copy via the same ``make_score_ops`` primitives the single-device
  loop uses, then ONE fused psum of (f, g[6], H[36]) = 43 floats;
- the Armijo line search's full-step trial score is a per-shard scalar
  psum (1 float); the batched backtrack pass psums its 7 scores as one
  vector. The r5 gather-reuse carry (trial rows double as the next
  derivative gather) works per shard unchanged.

Communication per iteration over ICI: one 43-float psum + one 1-float
psum (+ one 7-float psum on backtracking iterations) — independent of
cloud size, see COMM_TABLE.json.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from pcl_tpu.core.transforms import se3_exp, transform_points
from pcl_tpu.parallel.mesh import POINTS_AXIS
from pcl_tpu.registration.ndt import (
    _OFFSETS7,
    _OFFSETS27,
    _gauss_constants,
    build_grid,
    make_score_ops,
)


def sharded_ndt(
    mesh: Mesh,
    src_xyz, src_mask, tgt_xyz, tgt_mask,
    resolution: float = 1.0,
    init_transform=None,
    *,
    max_iterations: int = 35,
    transformation_eps: float = 1e-4,
    step_size: float = 0.1,
    outlier_ratio: float = 0.55,
    neighborhood: int = 7,
    table_size: int = 1 << 18,
    min_points: int = 6,
    axis: str = POINTS_AXIS,
):
    """Full multi-chip NDT Newton loop; returns (T [4,4] replicated,
    score, iterations). ``src_xyz``/``src_mask`` sharded over ``axis``;
    target replicated. Matches the single-device ``ndt`` result exactly
    up to fp reduction order (tests/test_parallel.py)."""
    if init_transform is None:
        init_transform = jnp.eye(4, dtype=jnp.float32)
    offsets = {1: _OFFSETS27[:1], 7: _OFFSETS7, 27: _OFFSETS27}[neighborhood]

    def body(sx, sm, tx, tm, T0):
        grid = build_grid(tx, tm, resolution,
                          table_size=table_size, min_points=min_points)
        d1, d2 = _gauss_constants(resolution, outlier_ratio)
        res = jnp.asarray(resolution, jnp.float32)
        gather_rows, score_from_rows, score_grad_hess = make_score_ops(
            grid, offsets, res, d1, d2, sm)

        def psum_score(f):
            return jax.lax.psum(f, axis)

        def score_at(p):
            return psum_score(score_from_rows(gather_rows(p), p))

        def newton_step(carry):
            it, T, _prev, _score, done, rows_cache = carry
            f_l, g_l, H_l = score_grad_hess(transform_points(T, sx),
                                            rows_cache)
            fgH = jax.lax.psum(
                jnp.concatenate([f_l[None], g_l, H_l.reshape(-1)]), axis)
            f0, g, H = fgH[0], fgH[1:7], fgH[7:].reshape(6, 6)
            lam = 1e-3 * jnp.maximum(jnp.trace(H) / 6.0, 1e-6)
            Hd = H + jnp.abs(lam) * jnp.eye(6)
            delta = -jnp.linalg.solve(Hd, g)
            descent = jnp.dot(delta, g) < 0.0
            delta = jnp.where(descent, delta, -g)
            dn = jnp.linalg.norm(delta)
            delta = delta * jnp.minimum(
                1.0, step_size / jnp.maximum(dn, 1e-12))
            gd = jnp.dot(g, delta)
            p1 = transform_points(se3_exp(delta) @ T, sx)
            rows1 = gather_rows(p1)
            f1 = psum_score(score_from_rows(rows1, p1))
            ok1 = f1 <= f0 + 1e-4 * gd

            def accept_full(_):
                return jnp.float32(1.0), f1, True, rows1

            def backtrack(_):
                alphas = 2.0 ** -jnp.arange(1, 8, dtype=jnp.float32)
                local = jax.vmap(lambda a: score_from_rows(
                    gather_rows(transform_points(se3_exp(a * delta) @ T,
                                                 sx)),
                    transform_points(se3_exp(a * delta) @ T, sx)))(alphas)
                scores = jax.lax.psum(local, axis)
                armijo = scores <= f0 + 1e-4 * alphas * gd
                any_ok = jnp.any(armijo)
                aidx = jnp.argmax(armijo)
                alpha = jnp.where(any_ok, alphas[aidx], 0.0)
                f_new = jnp.where(any_ok, scores[aidx], f0)
                improved = any_ok & (f_new < f0)
                p_acc = transform_points(
                    se3_exp(jnp.where(improved, alpha, 0.0) * delta) @ T,
                    sx)
                return alpha, f_new, improved, gather_rows(p_acc)

            alpha, f_new, improved, rows_new = jax.lax.cond(
                ok1, accept_full, backtrack, operand=None)
            step = jnp.where(improved, alpha, 0.0) * delta
            T_new = se3_exp(step) @ T
            dnorm = jnp.linalg.norm(step)
            done_new = (dnorm < transformation_eps) | (~improved)
            return (it + 1, T_new, dnorm,
                    jnp.where(improved, f_new, f0), done_new, rows_new)

        def cond(carry):
            it, _T, _d, _s, done, _rows = carry
            return (it < max_iterations) & (~done)

        rows_init = gather_rows(transform_points(T0, sx))
        init = (jnp.int32(0), T0, jnp.float32(jnp.inf),
                jnp.float32(jnp.inf), False, rows_init)
        it, T, _d, score, _done, _rows = jax.lax.while_loop(
            cond, newton_step, init)
        n_valid = jax.lax.psum(jnp.sum(sm.astype(jnp.float32)), axis)
        return T, -score / jnp.maximum(n_valid, 1.0), it

    fn = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(axis, None), P(axis), P(), P(), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(fn)(src_xyz, src_mask, tgt_xyz, tgt_mask,
                       init_transform.astype(jnp.float32))
