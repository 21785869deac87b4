"""FPCS-style featureless coarse alignment — congruent-set matching.

Capability equivalent of pcl::registration::FPCSInitialAlignment /
KFPCSInitialAlignment (reference: registration/include/pcl/registration/
ia_fpcs.h:81, ia_kfpcs.h:64 — 4-points-congruent-sets). The reference
extracts coplanar 4-point bases and searches congruent 4-sets via pair
tables. The TPU re-design keeps the core idea — match rigid-invariant
distance tuples between clouds without descriptors — with 3-point bases,
fully batched:

1. subsample both clouds;
2. sample B wide triangles from the source, record sorted edge lengths;
3. for every target point pair whose distance matches edge a, test all
   third points for edges (b, c) in one [B, P, M] comparison;
4. every congruent triad yields a rigid hypothesis (Umeyama); all are
   scored together by truncated subset error (the SAC-IA metric).

Like 4PCS, exactness of the congruence test is delta-bounded; unlike the
reference there is no coplanarity requirement (3 points are always planar).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from pcl_tpu.core.cloud import Cloud
from pcl_tpu.core import geometry
from pcl_tpu.registration.ia import IAResult, _batched_nn_d2


@partial(
    jax.jit,
    static_argnames=("n_bases", "n_target_sub", "pairs_per_base", "n_eval"),
)
def fpcs_align(
    source: Cloud,
    target: Cloud,
    *,
    delta: float = 0.05,
    key: Optional[jax.Array] = None,
    n_bases: int = 128,
    n_target_sub: int = 512,
    pairs_per_base: int = 8,
    n_eval: int = 512,
    error_threshold: Optional[float] = None,
) -> IAResult:
    """Coarse featureless alignment; returns the best rigid transform."""
    if key is None:
        key = jax.random.PRNGKey(0)
    sx, sm = source.xyz, source.mask
    tx, tm = target.xyz, target.mask
    k_base, k_sub, k_tsub, k_pair, k_eval = jax.random.split(key, 5)

    # target subsample [M,3]
    probs_t = tm.astype(jnp.float32)
    probs_t = probs_t / jnp.maximum(jnp.sum(probs_t), 1.0)
    tsub_idx = jax.random.categorical(
        k_tsub, jnp.log(probs_t + 1e-30)[None, :].repeat(n_target_sub, 0)
    ).astype(jnp.int32)
    T = tx[tsub_idx]                                     # [M,3]
    M = n_target_sub

    # B source triangles
    probs_s = sm.astype(jnp.float32)
    probs_s = probs_s / jnp.maximum(jnp.sum(probs_s), 1.0)
    tri_idx = jax.random.categorical(
        k_base, jnp.log(probs_s + 1e-30)[None, :].repeat(n_bases * 3, 0)
    ).reshape(n_bases, 3).astype(jnp.int32)
    S = sx[tri_idx]                                      # [B,3,3]
    a = jnp.linalg.norm(S[:, 1] - S[:, 0], axis=-1)      # [B]
    b = jnp.linalg.norm(S[:, 2] - S[:, 0], axis=-1)
    c = jnp.linalg.norm(S[:, 2] - S[:, 1], axis=-1)
    # degenerate (thin) triangles score poorly downstream; no explicit filter

    # candidate target pairs for edge a: sample P random pairs per base and
    # keep those with matching length (rejection sampling in-batch)
    pij = jax.random.randint(k_pair, (n_bases, pairs_per_base, 2), 0, M)
    Pi = T[pij[..., 0]]                                  # [B,P,3]
    Pj = T[pij[..., 1]]
    d_ij = jnp.linalg.norm(Pj - Pi, axis=-1)
    pair_ok = jnp.abs(d_ij - a[:, None]) < delta         # [B,P]

    # third point: all M candidates, test both remaining edges
    d_ik = jnp.linalg.norm(T[None, None, :, :] - Pi[:, :, None, :], axis=-1)  # [B,P,M]
    d_jk = jnp.linalg.norm(T[None, None, :, :] - Pj[:, :, None, :], axis=-1)
    tri_ok = (jnp.abs(d_ik - b[:, None, None]) < delta) & \
             (jnp.abs(d_jk - c[:, None, None]) < delta) & pair_ok[:, :, None]
    # pick the first matching k per (base, pair)
    kidx = jnp.argmax(tri_ok, axis=-1)                   # [B,P]
    has_match = jnp.any(tri_ok, axis=-1)
    Pk = jnp.take_along_axis(
        jnp.broadcast_to(T[None, None], (n_bases, pairs_per_base, M, 3)),
        kidx[..., None, None], axis=2,
    )[:, :, 0, :]

    # hypotheses: [B*P] triads
    src_tri = jnp.repeat(S[:, None, :, :], pairs_per_base, axis=1).reshape(-1, 3, 3)
    dst_tri = jnp.stack([Pi, Pj, Pk], axis=2).reshape(-1, 3, 3)
    w = jnp.ones((src_tri.shape[0], 3), jnp.float32)
    Ts = geometry.umeyama(src_tri, dst_tri, w)           # [H,4,4]
    hyp_ok = has_match.reshape(-1)

    # score on a fixed random subset (truncated error)
    if error_threshold is None:
        span = jnp.max(jnp.where(tm[:, None], tx, -jnp.inf), axis=0) - \
               jnp.min(jnp.where(tm[:, None], tx, jnp.inf), axis=0)
        thr = 0.25 * jnp.linalg.norm(span)
    else:
        thr = jnp.float32(error_threshold)
    sub = jax.random.categorical(
        k_eval, jnp.log(probs_s + 1e-30)[None, :].repeat(n_eval, 0)
    ).astype(jnp.int32)
    d2 = _batched_nn_d2(Ts, sx[sub], tx, tm)
    errs = jnp.mean(jnp.minimum(jnp.sqrt(jnp.maximum(d2, 0.0)), thr), axis=1)
    errs = jnp.where(hyp_ok & jnp.isfinite(Ts).all(axis=(1, 2)), errs, jnp.inf)
    best = jnp.argmin(errs)
    return IAResult(transform=Ts[best], error=errs[best],
                    valid=jnp.isfinite(errs[best]))


def kfpcs_align(
    source: Cloud,
    target: Cloud,
    *,
    salient_radius: float,
    non_max_radius: Optional[float] = None,
    delta: float = 0.05,
    key: Optional[jax.Array] = None,
    **fpcs_kw,
) -> IAResult:
    """Keypoint-based FPCS (reference: ia_kfpcs.h:64 —
    KFPCSInitialAlignment restricts congruent-set search to keypoints,
    trading density for distinctive, repeatable bases).

    Runs ISS3D on both clouds and feeds only the keypoints to fpcs_align;
    falls back to the full clouds when too few keypoints survive.
    """
    from pcl_tpu.keypoints.iss import iss3d_keypoints

    if non_max_radius is None:
        non_max_radius = salient_radius * 0.5
    # density-weighted ISS (the Zhong-2009 weighting): KFPCS only needs a
    # stable, well-spread salient subset — the density weighting is more
    # robust on the sparse structured clouds this coarse aligner targets
    # (the reference-exact unweighted default, r4, shifts keypoint picks)
    kp_s, _ = iss3d_keypoints(source, salient_radius, non_max_radius,
                              density_weights=True)
    kp_t, _ = iss3d_keypoints(target, salient_radius, non_max_radius,
                              density_weights=True)
    # keep clouds' static shapes: keypoints become the validity mask
    enough = (int(jnp.sum(kp_s)) >= 8) and (int(jnp.sum(kp_t)) >= 8)
    src = Cloud(xyz=source.xyz, mask=kp_s) if enough else source
    tgt = Cloud(xyz=target.xyz, mask=kp_t) if enough else target
    return fpcs_align(src, tgt, delta=delta, key=key, **fpcs_kw)
