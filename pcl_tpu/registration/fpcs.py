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


@partial(
    jax.jit,
    static_argnames=("n_bases", "n_target_sub", "pairs_per_base", "n_eval",
                     "n_hyp"),
)
def fpcs4_align(
    source: Cloud,
    target: Cloud,
    *,
    delta: float = 0.05,
    overlap: float = 0.5,
    key: Optional[jax.Array] = None,
    n_bases: int = 64,
    n_target_sub: int = 384,
    pairs_per_base: int = 256,
    n_hyp: int = 1024,
    n_eval: int = 384,
    error_threshold: Optional[float] = None,
) -> IAResult:
    """TRUE 4-points-congruent-sets coarse alignment (reference mechanism:
    ia_fpcs.h:81 / impl/ia_fpcs.hpp — coplanar wide 4-point bases, the two
    diagonals' intersection-ratio invariants (r1, r2), congruent-set search
    over target pair tables), fully batched:

    1. B wide source triangles (widest of an oversampled draw, edge span
       targeting ``overlap`` x the cloud diameter) + the most coplanar 4th
       point from a candidate draw;
    2. per base, the affine-invariant ratios (r1, r2) of the closest-point
       parameters of segments (p0,p1) x (p2,p3);
    3. ALL directed target-subsample pairs are length-matched against each
       base's two segment lengths (one shared [M, M] distance table); the
       ``pairs_per_base`` best per segment produce intermediate points
       e1 = q_i + r1 (q_j - q_i), e2; every (e1, e2) match within delta is
       a congruent 4-set;
    4. the top ``n_hyp`` sets by congruency residual become Umeyama
       hypotheses over their 4 correspondences, scored together by
       truncated subset error (the SAC-IA metric).
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    sx, sm = source.xyz, source.mask
    tx, tm = target.xyz, target.mask
    k_tri, k_c4, k_tsub, k_eval = jax.random.split(key, 4)
    delta = jnp.float32(delta)

    # --- source bases ---------------------------------------------------
    probs_s = sm.astype(jnp.float32)
    probs_s = probs_s / jnp.maximum(jnp.sum(probs_s), 1.0)
    span = jnp.max(jnp.where(sm[:, None], sx, -jnp.inf), axis=0) - \
           jnp.min(jnp.where(sm[:, None], sx, jnp.inf), axis=0)
    diam = jnp.linalg.norm(span)
    target_span = jnp.float32(overlap) * diam * 0.6
    OS = 4  # oversampling factor for wide-triangle selection
    tri_idx = jax.random.categorical(
        k_tri, jnp.log(probs_s + 1e-30)[None, :].repeat(OS * n_bases * 3, 0)
    ).reshape(OS * n_bases, 3).astype(jnp.int32)
    Tri = sx[tri_idx]                                     # [OB,3,3]
    e01 = jnp.linalg.norm(Tri[:, 1] - Tri[:, 0], axis=-1)
    e02 = jnp.linalg.norm(Tri[:, 2] - Tri[:, 0], axis=-1)
    e12 = jnp.linalg.norm(Tri[:, 2] - Tri[:, 1], axis=-1)
    min_edge = jnp.minimum(jnp.minimum(e01, e02), e12)
    max_edge = jnp.maximum(jnp.maximum(e01, e02), e12)
    # widest triangles that do not exceed the overlap span
    width_score = jnp.where(max_edge <= target_span, min_edge, -max_edge)
    _, keep = jax.lax.top_k(width_score, n_bases)
    tri_idx = tri_idx[keep]                               # [B,3]
    P0, P1, P2 = sx[tri_idx[:, 0]], sx[tri_idx[:, 1]], sx[tri_idx[:, 2]]
    # 4th point: most coplanar among K4 candidates, not too close
    K4 = 32
    c4 = jax.random.categorical(
        k_c4, jnp.log(probs_s + 1e-30)[None, :].repeat(n_bases * K4, 0)
    ).reshape(n_bases, K4).astype(jnp.int32)
    C4 = sx[c4]                                           # [B,K4,3]
    nrm = jnp.cross(P1 - P0, P2 - P0)
    nrm = nrm / jnp.maximum(jnp.linalg.norm(nrm, axis=-1, keepdims=True),
                            1e-12)
    dplane = jnp.abs(jnp.einsum("bkj,bj->bk", C4 - P0[:, None], nrm))
    dmin = jnp.minimum(
        jnp.minimum(jnp.linalg.norm(C4 - P0[:, None], axis=-1),
                    jnp.linalg.norm(C4 - P1[:, None], axis=-1)),
        jnp.linalg.norm(C4 - P2[:, None], axis=-1))
    cop_score = dplane + jnp.where(dmin < 0.05 * target_span, 1e6, 0.0)
    P3 = jnp.take_along_axis(
        C4, jnp.argmin(cop_score, axis=1)[:, None, None], axis=1)[:, 0]
    # order the quad as two crossing segments (p0,p1) x (p2,p3): among the
    # three pairings, take the one whose segments' closest points are
    # nearest (the true diagonals of a planar quad intersect)
    quads = jnp.stack([P0, P1, P2, P3], axis=1)           # [B,4,3]

    def seg_params(a, b, c, d):
        """Closest-point params (t1, t2) and gap of segments ab, cd."""
        u = b - a
        v = d - c
        w = a - c
        uu = jnp.sum(u * u, -1)
        vv = jnp.sum(v * v, -1)
        uv = jnp.sum(u * v, -1)
        uw = jnp.sum(u * w, -1)
        vw = jnp.sum(v * w, -1)
        den = uu * vv - uv * uv
        t1 = jnp.where(jnp.abs(den) > 1e-12,
                       (uv * vw - vv * uw) / jnp.maximum(den, 1e-12), 0.5)
        t2 = jnp.where(jnp.abs(den) > 1e-12,
                       (uu * vw - uv * uw) / jnp.maximum(den, 1e-12), 0.5)
        g1 = a + t1[..., None] * u
        g2 = c + t2[..., None] * v
        gap = jnp.linalg.norm(g1 - g2, axis=-1)
        return t1, t2, gap

    pairings = ((0, 1, 2, 3), (0, 2, 1, 3), (0, 3, 1, 2))
    tt1, tt2, gaps = [], [], []
    for (i, j, k2_, l) in pairings:
        t1, t2, gap = seg_params(quads[:, i], quads[:, j],
                                 quads[:, k2_], quads[:, l])
        inside = ((t1 > 0.05) & (t1 < 0.95) & (t2 > 0.05) & (t2 < 0.95))
        tt1.append(t1)
        tt2.append(t2)
        gaps.append(jnp.where(inside, gap, jnp.inf))
    gaps = jnp.stack(gaps, axis=1)                        # [B,3]
    best_pair = jnp.argmin(gaps, axis=1)                  # [B]
    pick = jnp.asarray(pairings, jnp.int32)[best_pair]    # [B,4]
    A = jnp.take_along_axis(quads, pick[:, 0:1, None].repeat(3, 2), 1)[:, 0]
    Bp = jnp.take_along_axis(quads, pick[:, 1:2, None].repeat(3, 2), 1)[:, 0]
    Cc = jnp.take_along_axis(quads, pick[:, 2:3, None].repeat(3, 2), 1)[:, 0]
    D = jnp.take_along_axis(quads, pick[:, 3:4, None].repeat(3, 2), 1)[:, 0]
    r1 = jnp.take_along_axis(jnp.stack(tt1, 1), best_pair[:, None], 1)[:, 0]
    r2 = jnp.take_along_axis(jnp.stack(tt2, 1), best_pair[:, None], 1)[:, 0]
    d1 = jnp.linalg.norm(Bp - A, axis=-1)                 # [B]
    d2len = jnp.linalg.norm(D - Cc, axis=-1)
    base_ok = jnp.isfinite(jnp.min(gaps, axis=1))

    # --- target pair tables ---------------------------------------------
    probs_t = tm.astype(jnp.float32)
    probs_t = probs_t / jnp.maximum(jnp.sum(probs_t), 1.0)
    tsub = jax.random.categorical(
        k_tsub, jnp.log(probs_t + 1e-30)[None, :].repeat(n_target_sub, 0)
    ).astype(jnp.int32)
    Q = tx[tsub]                                          # [M,3]
    M = n_target_sub
    plen = jnp.linalg.norm(Q[:, None, :] - Q[None, :, :], axis=-1)
    plen = plen.at[jnp.arange(M), jnp.arange(M)].set(jnp.inf)
    flat_len = plen.reshape(-1)                           # [M*M] directed

    K = pairs_per_base

    def pairs_for(dlen):
        # [B, K] flattened directed-pair ids best matching each base len
        s = -jnp.abs(flat_len[None, :] - dlen[:, None])   # [B, M*M]
        val, idx = jax.lax.top_k(s, K)
        ok = -val < delta
        return idx, ok

    idx1, ok1 = pairs_for(d1)
    idx2, ok2 = pairs_for(d2len)
    i1, j1 = idx1 // M, idx1 % M
    i2, j2 = idx2 // M, idx2 % M
    E1 = Q[i1] + r1[:, None, None] * (Q[j1] - Q[i1])      # [B,K,3]
    E2 = Q[i2] + r2[:, None, None] * (Q[j2] - Q[i2])
    # congruency: match every e1 against every e2 within the base
    gap12 = jnp.linalg.norm(E1[:, :, None, :] - E2[:, None, :, :], axis=-1)
    gap12 = jnp.where(ok1[:, :, None] & ok2[:, None, :] & base_ok[:, None, None],
                      gap12, jnp.inf)                     # [B,K,K]
    # best e2 per e1
    best2 = jnp.argmin(gap12, axis=2)                     # [B,K]
    bestgap = jnp.min(gap12, axis=2)
    # global top n_hyp candidate sets by congruency residual
    flatgap = bestgap.reshape(-1)                         # [B*K]
    _, hid = jax.lax.top_k(-flatgap, n_hyp)
    hb, hk = hid // K, hid % K
    h2 = best2[hb, hk]
    hyp_ok = jnp.isfinite(flatgap[hid]) & (flatgap[hid] < delta)
    src4 = jnp.stack([A[hb], Bp[hb], Cc[hb], D[hb]], axis=1)   # [H,4,3]
    dst4 = jnp.stack([Q[i1[hb, hk]], Q[j1[hb, hk]],
                      Q[i2[hb, h2]], Q[j2[hb, h2]]], axis=1)
    w4 = jnp.ones((n_hyp, 4), jnp.float32)
    Ts = geometry.umeyama(src4, dst4, w4)                 # [H,4,4]

    # --- scoring ---------------------------------------------------------
    if error_threshold is None:
        thr = 0.25 * jnp.linalg.norm(span)
    else:
        thr = jnp.float32(error_threshold)
    sub = jax.random.categorical(
        k_eval, jnp.log(probs_s + 1e-30)[None, :].repeat(n_eval, 0)
    ).astype(jnp.int32)
    d2e = _batched_nn_d2(Ts, sx[sub], tx, tm)
    errs = jnp.mean(jnp.minimum(jnp.sqrt(jnp.maximum(d2e, 0.0)), thr), axis=1)
    errs = jnp.where(hyp_ok & jnp.isfinite(Ts).all(axis=(1, 2)), errs, jnp.inf)
    best = jnp.argmin(errs)
    return IAResult(transform=Ts[best], error=errs[best],
                    valid=jnp.isfinite(errs[best]))


def fpcs4_align_host(
    source: Cloud,
    target: Cloud,
    *,
    delta: float = 0.05,
    overlap: float = 0.5,
    key=None,
    n_bases: int = 64,
    max_sets_per_base: int = 64,
    n_eval: int = 384,
    seed: int = 0,
) -> IAResult:
    """4PCS with the reference's FULL pair-table search (host loop +
    native kd-tree), for scenarios where sparse-keypoint repeatability
    error approaches the matching tolerances (the office1/office2 KFPCS
    golden, test_kfpcs_ia.cpp). Per base (reference impl/ia_fpcs.hpp):

    - wide coplanar 4-point base bounded by 2 * overlap * diameter
      (ia_fpcs.hpp:286), diagonal intersection ratios (r1, r2);
    - ALL directed target pairs within ``max_pair_diff = 2 delta`` of each
      segment length (ia_fpcs.hpp:329,608) — no subsetting; intermediate
      points e1/e2 matched within ``coincidation_limit = 2 delta``
      (ia_fpcs.hpp:331,696) with the native C++ kd-tree;
    - each congruent set is validated by its 4-point Umeyama MSE
      <= (2 delta)^2 (max_mse, ia_fpcs.hpp:332) and scored by truncated
      subset error; the best-scoring pose wins.
    """
    import numpy as np
    from pcl_tpu import native

    rng = np.random.default_rng(seed)
    sxyz = np.asarray(source.xyz)[np.asarray(source.mask)]
    txyz = np.asarray(target.xyz)[np.asarray(target.mask)]
    ns, M = len(sxyz), len(txyz)
    diam = float(np.linalg.norm(sxyz.max(0) - sxyz.min(0)))
    max_base = 2.0 * overlap * diam
    too_close = 0.1 * max_base
    max_pair_diff = 2.0 * delta
    coincid = 2.0 * delta
    max_mse = (2.0 * delta) ** 2

    plen = np.linalg.norm(txyz[:, None, :] - txyz[None, :, :], axis=-1)
    np.fill_diagonal(plen, np.inf)

    def seg_params(a, b, c, d):
        u, v, w = b - a, d - c, a - c
        uu, vv = u @ u, v @ v
        uv, uw, vw = u @ v, u @ w, v @ w
        den = uu * vv - uv * uv
        if abs(den) < 1e-12:
            return None
        t1 = (uv * vw - vv * uw) / den
        t2 = (uu * vw - uv * uw) / den
        gap = np.linalg.norm((a + t1 * u) - (c + t2 * v))
        return t1, t2, gap

    cands_src, cands_dst = [], []
    for _b in range(n_bases):
        # wide coplanar base
        best = None
        for _try in range(20):
            i, j, k = rng.choice(ns, 3, replace=False)
            a, b, c = sxyz[i], sxyz[j], sxyz[k]
            e = [np.linalg.norm(b - a), np.linalg.norm(c - a),
                 np.linalg.norm(c - b)]
            if min(e) < too_close or max(e) > max_base:
                continue
            if best is None or min(e) > best[0]:
                best = (min(e), a, b, c)
        if best is None:
            continue
        _, a, b, c = best
        nrm = np.cross(b - a, c - a)
        nn = np.linalg.norm(nrm)
        if nn < 1e-9:
            continue
        nrm /= nn
        c4 = sxyz[rng.choice(ns, 64, replace=ns < 64)]
        dpl = np.abs((c4 - a) @ nrm)
        dmin = np.minimum.reduce([np.linalg.norm(c4 - p, axis=1)
                                  for p in (a, b, c)])
        dpl[dmin < too_close] = np.inf
        d = c4[int(np.argmin(dpl))]
        # diagonal pairing with interior intersection
        bestp = None
        for (p0, p1, p2, p3) in ((a, b, c, d), (a, c, b, d), (a, d, b, c)):
            sp = seg_params(p0, p1, p2, p3)
            if sp is None:
                continue
            t1, t2, gap = sp
            if 0.0 < t1 < 1.0 and 0.0 < t2 < 1.0:
                if bestp is None or gap < bestp[0]:
                    bestp = (gap, p0, p1, p2, p3, t1, t2)
        if bestp is None:
            continue
        _, p0, p1, p2, p3, r1, r2 = bestp
        d1 = np.linalg.norm(p1 - p0)
        d2l = np.linalg.norm(p3 - p2)
        # full directed pair tables (reference: no subsetting)
        ii1, jj1 = np.nonzero(np.abs(plen - d1) < max_pair_diff)
        ii2, jj2 = np.nonzero(np.abs(plen - d2l) < max_pair_diff)
        if len(ii1) == 0 or len(ii2) == 0:
            continue
        e1 = txyz[ii1] + r1 * (txyz[jj1] - txyz[ii1])
        e2 = txyz[ii2] + r2 * (txyz[jj2] - txyz[ii2])
        tree = native.KdTree(e1)
        d2q, idq = tree.knn(e2, 1)
        hit = np.sqrt(np.maximum(d2q[:, 0], 0.0)) < coincid
        hit_ids = np.nonzero(hit)[0]
        if len(hit_ids) == 0:
            continue
        if len(hit_ids) > max_sets_per_base:
            hit_ids = rng.choice(hit_ids, max_sets_per_base, replace=False)
        m1 = idq[hit_ids, 0]
        src4 = np.stack([np.broadcast_to(p, (len(hit_ids), 3))
                         for p in (p0, p1, p2, p3)], axis=1)
        dst4 = np.stack([txyz[ii1[m1]], txyz[jj1[m1]],
                         txyz[ii2[hit_ids]], txyz[jj2[hit_ids]]], axis=1)
        cands_src.append(src4)
        cands_dst.append(dst4)

    if not cands_src:
        return IAResult(transform=jnp.eye(4), error=jnp.float32(jnp.inf),
                        valid=jnp.bool_(False))
    src4 = np.concatenate(cands_src)
    dst4 = np.concatenate(cands_dst)
    w4 = jnp.ones((len(src4), 4), jnp.float32)
    Ts = geometry.umeyama(jnp.asarray(src4), jnp.asarray(dst4), w4)
    # validate by the base's own MSE (reference validateMatch, max_mse)
    fit = jnp.einsum("hij,hkj->hki", Ts[:, :3, :3], jnp.asarray(src4)) \
        + Ts[:, None, :3, 3]
    mse = jnp.mean(jnp.sum((fit - jnp.asarray(dst4)) ** 2, axis=-1), axis=1)
    ok = mse <= max_mse
    # score by truncated subset error
    sub = rng.choice(ns, min(n_eval, ns), replace=False)
    thr = 0.25 * diam
    d2e = _batched_nn_d2(Ts, jnp.asarray(sxyz[sub]),
                         jnp.asarray(txyz), jnp.ones(M, bool))
    errs = jnp.mean(jnp.minimum(jnp.sqrt(jnp.maximum(d2e, 0.0)), thr), axis=1)
    errs = jnp.where(ok & jnp.isfinite(Ts).all(axis=(1, 2)), errs, jnp.inf)
    best = int(jnp.argmin(errs))
    return IAResult(transform=Ts[best], error=errs[best],
                    valid=jnp.isfinite(errs[best]))
