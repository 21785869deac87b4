"""Batched-hypothesis sample consensus estimators.

Re-design of pcl::RandomSampleConsensus and friends (reference:
sample_consensus/impl/ransac.hpp:57 adaptive-k loop, msac.hpp, lmeds.hpp,
rransac.hpp). The sequential hypothesize-verify loop becomes one batch:

  draw B minimal samples -> fit B models (vectorized minimal solver) ->
  score all B x N residuals in one reduction -> argbest -> refine.

This evaluates every hypothesis PCL would ever reach (B >= its adaptive k
bound) with two device reductions and no host sync — the TPU answer to
"RANSAC adaptive-k is sequential" (SURVEY §7 Hard parts).

Scoring methods:
- RANSAC: inlier count (sac.h semantics)
- MSAC: sum of min(d^2, thr^2) (msac.hpp truncated loss)
- LMEDS: median squared residual (lmeds.hpp; threshold-free)
- RRANSAC: inlier count over a random pre-verification subset, full scoring
  only implicitly (rransac.hpp's d_pre speedup is unnecessary when all
  hypotheses are batched, so this is RANSAC with subset scoring)
- MLESAC: truncated negative log-likelihood (mlesac.hpp simplified: inlier
  Gaussian + outlier uniform, fixed mixing weight)
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from pcl_tpu.sac.models import SacModel, RegistrationModel

Method = ("ransac", "msac", "lmeds", "rransac", "rmsac", "mlesac")


class SacResult(NamedTuple):
    coefficients: jax.Array   # [C] best model (refined if refine=True)
    inliers: jax.Array        # [N] bool
    num_inliers: jax.Array    # int32
    score: jax.Array          # f32 (method-dependent, higher is better)
    valid: jax.Array          # bool — a usable model was found


def _sample_indices(key, n_hypotheses, sample_size, n_points, probs):
    """[B, m] random distinct-ish indices. Distinctness is enforced by
    re-rolling collisions once; surviving duplicate samples fit degenerate
    models that score -inf, mirroring PCL's isSampleGood rejection."""
    keys = jax.random.split(key, sample_size)
    cols = [jax.random.categorical(k, jnp.log(probs)[None, :].repeat(n_hypotheses, 0))
            for k in keys]
    idx = jnp.stack(cols, axis=1).astype(jnp.int32)
    return idx


def _prosac_indices(key, n_hypotheses, sample_size, n_points, quality, mask):
    """PROSAC progressive sampling (reference: prosac.hpp): hypothesis b
    draws from the m_b highest-quality points, with m_b growing linearly
    from sample_size to N over the batch — the batched analog of PROSAC's
    growth function. ``quality`` is higher-is-better per point."""
    order = jnp.argsort(jnp.where(mask, -quality, jnp.inf))          # [N] best first
    n_valid = jnp.sum(mask.astype(jnp.int32))
    b = jnp.arange(n_hypotheses, dtype=jnp.float32) / max(n_hypotheses - 1, 1)
    m_b = (sample_size + b * (n_valid.astype(jnp.float32) - sample_size)).astype(jnp.int32)
    m_b = jnp.maximum(m_b, sample_size)                              # [B]
    keys = jax.random.split(key, sample_size)
    ranks = jnp.arange(n_points, dtype=jnp.float32)
    cols = []
    for k in keys:
        logits = jnp.where(ranks[None, :] < m_b[:, None], 0.0, -jnp.inf)  # [B, N]
        r = jax.random.categorical(k, logits)                        # rank position
        cols.append(order[r])
    return jnp.stack(cols, axis=1).astype(jnp.int32)


@partial(
    jax.jit,
    static_argnames=("model", "n_hypotheses", "method", "refine", "rransac_frac"),
)
def ransac(
    model: SacModel,
    xyz: jax.Array,
    mask: jax.Array,
    threshold: float,
    *,
    key: Optional[jax.Array] = None,
    n_hypotheses: int = 1024,
    method: str = "ransac",
    refine: bool = True,
    normals: Optional[jax.Array] = None,
    target_xyz: Optional[jax.Array] = None,
    rransac_frac: float = 0.1,
    quality: Optional[jax.Array] = None,
) -> SacResult:
    """Fit ``model`` to the masked points robustly.

    ``target_xyz`` activates paired mode for RegistrationModel: xyz[i] and
    target_xyz[i] are a correspondence. Returns the best (optionally refined)
    model + inlier mask.
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    n = xyz.shape[0]
    w = mask.astype(jnp.float32)
    probs = w / jnp.maximum(jnp.sum(w), 1.0)

    k_idx, k_sub = jax.random.split(key)
    if quality is not None:
        # PROSAC-style progressive sampling from quality-ranked points
        idx = _prosac_indices(k_idx, n_hypotheses, model.sample_size, n, quality, mask)
    else:
        idx = _sample_indices(k_idx, n_hypotheses, model.sample_size, n, probs)
    samples = xyz[idx]                                     # [B, m, 3]
    sample_normals = normals[idx] if normals is not None else None
    scores_with_normals = getattr(model, "scores_with_normals", False) and normals is not None

    paired = isinstance(model, RegistrationModel)
    if paired:
        if target_xyz is None:
            raise ValueError("RegistrationModel requires target_xyz")
        coeffs = model.fit(samples, target_samples=target_xyz[idx])
        d = model.distances(coeffs, xyz, target_xyz=target_xyz)
    elif scores_with_normals:
        coeffs = model.fit(samples, sample_normals)
        d = model.distances(coeffs, xyz, normals=normals)  # [B, N]
    else:
        coeffs = model.fit(samples, sample_normals)
        d = model.distances(coeffs, xyz)                   # [B, N]

    thr = jnp.float32(threshold)
    valid_pt = mask[None, :]
    d = jnp.where(valid_pt, d, jnp.inf)
    model_ok = jnp.all(jnp.isfinite(coeffs), axis=-1)

    if method == "ransac":
        score = jnp.sum((d <= thr).astype(jnp.float32), axis=-1)
    elif method == "msac":
        loss = jnp.where(valid_pt, jnp.minimum(d * d, thr * thr), 0.0)
        score = -jnp.sum(loss, axis=-1)
    elif method == "lmeds":
        d2 = jnp.where(valid_pt, d * d, jnp.nan)
        score = -jnp.nanmedian(d2, axis=-1)
    elif method == "rransac":
        sub = jax.random.bernoulli(k_sub, rransac_frac, (n,)) & mask
        score = jnp.sum(((d <= thr) & sub[None, :]).astype(jnp.float32), axis=-1)
    elif method == "rmsac":
        sub = (jax.random.bernoulli(k_sub, rransac_frac, (n,)) & mask)[None, :]
        loss = jnp.where(sub, jnp.minimum(d * d, thr * thr), 0.0)
        score = -jnp.sum(loss, axis=-1)
    elif method == "mlesac":
        sigma = thr / 2.0
        inlier_ll = jnp.exp(-0.5 * (d / sigma) ** 2) / (sigma * 2.5066283)
        out_ll = 1.0 / jnp.maximum(thr * 20.0, 1e-6)
        ll = jnp.log(0.5 * inlier_ll + 0.5 * out_ll)
        score = jnp.sum(jnp.where(valid_pt, ll, 0.0), axis=-1)
    else:
        raise ValueError(f"unknown method {method!r}")

    score = jnp.where(model_ok, score, -jnp.inf)
    best = jnp.argmax(score)
    best_coeffs = coeffs[best]
    best_d = d[best]
    inliers = mask & (best_d <= thr)
    n_inl = jnp.sum(inliers.astype(jnp.int32))
    ok = model_ok[best] & (n_inl >= model.sample_size)

    if refine:
        wi = inliers.astype(jnp.float32)
        if paired:
            refined = model.refine(best_coeffs, xyz, wi, target_xyz=target_xyz)
        else:
            refined = model.refine(best_coeffs, xyz, wi)
        refined_ok = jnp.all(jnp.isfinite(refined))
        best_coeffs = jnp.where(ok & refined_ok, refined, best_coeffs)
        # recompute inliers under the refined model
        if paired:
            d_ref = model.distances(best_coeffs, xyz, target_xyz=target_xyz)
        elif scores_with_normals:
            d_ref = model.distances(best_coeffs[None], xyz, normals=normals)[0]
        else:
            d_ref = model.distances(best_coeffs[None], xyz)[0]
        inliers = mask & (d_ref <= thr)
        n_inl = jnp.sum(inliers.astype(jnp.int32))

    return SacResult(
        coefficients=best_coeffs,
        inliers=inliers,
        num_inliers=n_inl,
        score=score[best],
        valid=ok,
    )
