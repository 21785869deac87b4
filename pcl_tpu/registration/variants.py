"""ICP variants beyond the core loop: nonlinear (LM) and joint multi-pair.

Equivalents of pcl::IterativeClosestPointNonLinear (reference:
registration/include/pcl/registration/icp_nl.h:67 — LM optimization over a
WarpPointRigid parameterization instead of the closed-form SVD) and
pcl::JointIterativeClosestPoint (reference: joint_icp.h:53 — several
source/target pairs constrained to ONE common rigid transform, e.g.
multi-sensor rigs with a shared motion).

Both keep the pcl_tpu ICP structure: static-shape correspondence sweeps +
estimation, the whole loop in one jit.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp

from pcl_tpu.core.cloud import Cloud
from pcl_tpu.core.transforms import transform_points
from pcl_tpu.registration import correspondence as corr_mod
from pcl_tpu.registration import estimation
from pcl_tpu.registration.icp import (
    ICPResult, CONV_RUNNING, CONV_ITERATIONS, CONV_TRANSFORM,
    CONV_ABS_MSE, CONV_REL_MSE, CONV_FAILED_CORRESPONDENCES,
)

_WARPS = {
    "rigid_6d": (estimation.warp_rigid_6d, 6),
    "rigid_3d": (estimation.warp_rigid_3d, 3),
    "translation": (estimation.warp_translation, 3),
}


@partial(
    jax.jit,
    static_argnames=("max_corr_dist", "max_iterations", "warp",
                     "lm_iterations", "min_correspondences"),
)
def icp_nl(
    source: Cloud,
    target: Cloud,
    init_transform: Optional[jax.Array] = None,
    *,
    max_corr_dist: float = jnp.inf,
    max_iterations: int = 50,
    transformation_eps: float = 0.0,
    abs_mse_eps: float = 1e-12,
    rel_mse_eps: float = 1e-8,
    warp: str = "rigid_6d",
    lm_iterations: int = 5,
    min_correspondences: int = 3,
) -> ICPResult:
    """Nonlinear ICP: per-iteration Levenberg-Marquardt estimation over a
    warp parameterization (reference icp_nl.h + warp_point_rigid*.h)."""
    if init_transform is None:
        init_transform = jnp.eye(4, dtype=jnp.float32)
    warp_fn, n_params = _WARPS[warp]
    sx, sm = source.xyz, source.mask
    tx, tm = target.xyz, target.mask

    def body(state):
        it, T, prev_mse, mse, n_corr, code = state
        src_t = transform_points(T, sx)
        c = corr_mod.determine_correspondences(src_t, sm, tx, tm, max_corr_dist)
        w = c.valid.astype(jnp.float32)
        n_corr_new = jnp.sum(c.valid.astype(jnp.int32))
        dst = tx[jnp.clip(c.index, 0, tx.shape[0] - 1)]
        T_delta = estimation.estimate_lm(
            src_t, dst, w, warp=warp_fn, n_params=n_params,
            iterations=lm_iterations)
        mse_new = jnp.sum(w * c.sqdist) / jnp.maximum(jnp.sum(w), 1.0)
        ok = n_corr_new >= min_correspondences
        T_delta = jnp.where(ok, T_delta, jnp.eye(4, dtype=T.dtype))
        it = it + 1
        t2 = jnp.sum(T_delta[:3, 3] ** 2)
        cos_r = jnp.clip((jnp.trace(T_delta[:3, :3]) - 1.0) * 0.5, -1.0, 1.0)
        small = (t2 <= transformation_eps) & ((1.0 - cos_r) <= transformation_eps) \
            & (transformation_eps > 0.0)
        abs_ok = jnp.abs(mse_new - mse) < abs_mse_eps
        rel_ok = jnp.abs(mse_new - mse) < rel_mse_eps * jnp.abs(mse)
        code = jnp.where(
            ~ok, CONV_FAILED_CORRESPONDENCES,
            jnp.where(small, CONV_TRANSFORM,
                      jnp.where(abs_ok & (it > 1), CONV_ABS_MSE,
                                jnp.where(rel_ok & (it > 1), CONV_REL_MSE,
                                          jnp.where(it >= max_iterations,
                                                    CONV_ITERATIONS, CONV_RUNNING)))),
        ).astype(jnp.int32)
        return (it, T_delta @ T, mse, mse_new, n_corr_new, code)

    def cond(state):
        it, T, prev_mse, mse, n_corr, code = state
        return (it < max_iterations) & (code == CONV_RUNNING)

    state0 = (jnp.int32(0), init_transform.astype(jnp.float32),
              jnp.float32(jnp.inf), jnp.float32(jnp.inf),
              jnp.int32(0), jnp.int32(CONV_RUNNING))
    it, T, _, mse, n_corr, code = jax.lax.while_loop(cond, body, state0)
    return ICPResult(T, code > 0, it, mse, n_corr, code, jnp.bool_(False))


def joint_icp(
    sources: Sequence[Cloud],
    targets: Sequence[Cloud],
    init_transform: Optional[jax.Array] = None,
    *,
    max_corr_dist: float = jnp.inf,
    max_iterations: int = 50,
    abs_mse_eps: float = 1e-12,
    rel_mse_eps: float = 1e-8,
    min_correspondences: int = 3,
) -> ICPResult:
    """Joint ICP: one rigid transform explaining ALL source/target pairs
    (reference: joint_icp.h:53 — correspondences estimated per pair, a
    single SVD estimation over their union)."""
    if len(sources) != len(targets) or not sources:
        raise ValueError("joint_icp needs equal-length non-empty cloud lists")
    if init_transform is None:
        init_transform = jnp.eye(4, dtype=jnp.float32)

    sxs = [c.xyz for c in sources]
    sms = [c.mask for c in sources]
    txs = [c.xyz for c in targets]
    tms = [c.mask for c in targets]

    @partial(jax.jit, static_argnames=())
    def run(T0, *arrs):
        n_pairs = len(sources)
        sx = arrs[:n_pairs]
        sm = arrs[n_pairs:2 * n_pairs]
        tx = arrs[2 * n_pairs:3 * n_pairs]
        tm = arrs[3 * n_pairs:]

        def body(state):
            it, T, prev_mse, mse, n_corr, code = state
            srcs, dsts, ws, sq = [], [], [], []
            for k in range(n_pairs):
                src_t = transform_points(T, sx[k])
                c = corr_mod.determine_correspondences(
                    src_t, sm[k], tx[k], tm[k], max_corr_dist)
                srcs.append(src_t)
                dsts.append(tx[k][jnp.clip(c.index, 0, tx[k].shape[0] - 1)])
                ws.append(c.valid.astype(jnp.float32))
                sq.append(c.sqdist)
            src_all = jnp.concatenate(srcs)
            dst_all = jnp.concatenate(dsts)
            w_all = jnp.concatenate(ws)
            sq_all = jnp.concatenate(sq)
            n_corr_new = jnp.sum(w_all).astype(jnp.int32)
            T_delta = estimation.estimate_svd(src_all, dst_all, w_all)
            mse_new = jnp.sum(w_all * sq_all) / jnp.maximum(jnp.sum(w_all), 1.0)
            ok = n_corr_new >= min_correspondences
            T_delta = jnp.where(ok, T_delta, jnp.eye(4, dtype=T.dtype))
            it = it + 1
            abs_ok = jnp.abs(mse_new - mse) < abs_mse_eps
            rel_ok = jnp.abs(mse_new - mse) < rel_mse_eps * jnp.abs(mse)
            code = jnp.where(
                ~ok, CONV_FAILED_CORRESPONDENCES,
                jnp.where(abs_ok & (it > 1), CONV_ABS_MSE,
                          jnp.where(rel_ok & (it > 1), CONV_REL_MSE,
                                    jnp.where(it >= max_iterations,
                                              CONV_ITERATIONS, CONV_RUNNING))),
            ).astype(jnp.int32)
            return (it, T_delta @ T, mse, mse_new, n_corr_new, code)

        def cond(state):
            it, T, prev_mse, mse, n_corr, code = state
            return (it < max_iterations) & (code == CONV_RUNNING)

        state0 = (jnp.int32(0), T0.astype(jnp.float32),
                  jnp.float32(jnp.inf), jnp.float32(jnp.inf),
                  jnp.int32(0), jnp.int32(CONV_RUNNING))
        return jax.lax.while_loop(cond, body, state0)

    it, T, _, mse, n_corr, code = run(init_transform, *sxs, *sms, *txs, *tms)
    return ICPResult(T, code > 0, it, mse, n_corr, code, jnp.bool_(False))
