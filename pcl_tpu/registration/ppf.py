"""PPF registration — Drost-style point-pair-feature voting.

Re-design of pcl::PPFRegistration + pcl::PPFEstimation (reference:
registration/include/pcl/registration/ppf_registration.h:182,
registration/src/ppf_registration.cpp; feature at features/include/pcl/
features/ppf.h). The reference hashes every model pair's quantized PPF into
a std::map and votes scene pairs sequentially. TPU form:

- model table: all (subsampled) model pairs' PPFs quantized and scattered
  into a fixed hash table [table, cap] of (ref index, alpha_model) entries;
- voting: every scene pair looks its bucket up and scatter-adds into the
  [scene_ref, model_ref, alpha] accumulator in one segment_sum;
- the peak vote yields the pose (align ref point + normal, then rotate by
  alpha about the normal), exactly the reference's pose recovery.

PPF = (angle(n1, d), angle(n2, d), angle(n1, n2), ||d||), quantized.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from pcl_tpu.core.cloud import Cloud, ATTR_NORMAL
from pcl_tpu.core.transforms import se3_exp, from_rt

_EPS = 1e-12


def ppf_features(p1, n1, p2, n2):
    """Batched PPF tuple (f1,f2,f3,f4) (reference features/ppf.h)."""
    d = p2 - p1
    f4 = jnp.linalg.norm(d, axis=-1)
    dn = d / jnp.maximum(f4, _EPS)[..., None]
    f1 = jnp.arccos(jnp.clip(jnp.sum(n1 * dn, axis=-1), -1, 1))
    f2 = jnp.arccos(jnp.clip(jnp.sum(n2 * dn, axis=-1), -1, 1))
    f3 = jnp.arccos(jnp.clip(jnp.sum(n1 * n2, axis=-1), -1, 1))
    return f1, f2, f3, f4


def _quantize(f1, f2, f3, f4, angle_step, dist_step, table_size):
    q1 = (f1 / angle_step).astype(jnp.int32)
    q2 = (f2 / angle_step).astype(jnp.int32)
    q3 = (f3 / angle_step).astype(jnp.int32)
    q4 = (f4 / dist_step).astype(jnp.int32)
    h = (q1 * 73856093) ^ (q2 * 19349669) ^ (q3 * 83492791) ^ (q4 * 67867967)
    return jnp.abs(h) % jnp.int32(table_size)


def _alpha(p_ref, n_ref, p_other):
    """In-plane angle of p_other around the (p_ref, n_ref) axis after
    canonical alignment (the Drost alpha)."""
    # build the canonical frame: x = n_ref
    x = n_ref
    a = jnp.where(jnp.abs(x[..., 0:1]) < 0.9,
                  jnp.broadcast_to(jnp.asarray([1.0, 0, 0]), x.shape),
                  jnp.broadcast_to(jnp.asarray([0.0, 1, 0]), x.shape))
    y = jnp.cross(x, a)
    y = y / jnp.maximum(jnp.linalg.norm(y, axis=-1, keepdims=True), _EPS)
    z = jnp.cross(x, y)
    d = p_other - p_ref
    return jnp.arctan2(jnp.sum(d * z, axis=-1), jnp.sum(d * y, axis=-1))


class PPFResult(NamedTuple):
    transform: jax.Array
    votes: jax.Array
    valid: jax.Array


@partial(
    jax.jit,
    static_argnames=("n_model", "n_scene_ref", "n_scene", "table_size",
                     "cap", "n_alpha"),
)
def ppf_register(
    model: Cloud,
    scene: Cloud,
    *,
    key: Optional[jax.Array] = None,
    n_model: int = 192,
    n_scene_ref: int = 32,
    n_scene: int = 192,
    angle_step: float = jnp.pi / 15,
    dist_step: float = 0.05,
    table_size: int = 1 << 16,
    cap: int = 8,
    n_alpha: int = 30,
) -> PPFResult:
    """Find the model pose in the scene by PPF voting. Both clouds need
    normals."""
    if ATTR_NORMAL not in model.attrs or ATTR_NORMAL not in scene.attrs:
        raise ValueError("ppf_register requires normals on both clouds")
    if key is None:
        key = jax.random.PRNGKey(0)
    k_m, k_sr, k_s = jax.random.split(key, 3)

    def subsample(c, kk, count):
        probs = c.mask.astype(jnp.float32)
        probs = probs / jnp.maximum(jnp.sum(probs), 1.0)
        idx = jax.random.categorical(
            kk, jnp.log(probs + 1e-30)[None, :].repeat(count, 0)
        ).astype(jnp.int32)
        return c.xyz[idx], c.attrs[ATTR_NORMAL][idx]

    mp, mn = subsample(model, k_m, n_model)
    sp_ref, sn_ref = subsample(scene, k_sr, n_scene_ref)
    sp, sn = subsample(scene, k_s, n_scene)

    # ---- offline: model pair table -------------------------------------
    # all ordered pairs (i_ref, j) of the model subsample
    i = jnp.repeat(jnp.arange(n_model), n_model)
    j = jnp.tile(jnp.arange(n_model), n_model)
    valid_pair = i != j
    f1, f2, f3, f4 = ppf_features(mp[i], mn[i], mp[j], mn[j])
    hh = _quantize(f1, f2, f3, f4, angle_step, dist_step, table_size)
    hh = jnp.where(valid_pair, hh, jnp.int32(table_size))
    alpha_m = _alpha(mp[i], mn[i], mp[j])
    # scatter pairs into the hash table
    order = jnp.argsort(hh)
    hs = hh[order]
    start = jnp.searchsorted(hs, jnp.arange(table_size + 2, dtype=jnp.int32))
    rank = jnp.arange(hs.shape[0]) - start[hs]
    keep = rank < cap
    flat = jnp.where(keep, hs * cap + rank, jnp.int32(table_size * cap))
    tbl_ref = jnp.full(((table_size + 1) * cap,), -1, jnp.int32)
    tbl_alpha = jnp.zeros(((table_size + 1) * cap,), jnp.float32)
    tbl_ref = tbl_ref.at[flat].set(i[order], mode="drop")
    tbl_alpha = tbl_alpha.at[flat].set(alpha_m[order], mode="drop")
    tbl_ref = tbl_ref.reshape(table_size + 1, cap)
    tbl_alpha = tbl_alpha.reshape(table_size + 1, cap)

    # ---- online: scene voting ------------------------------------------
    si = jnp.repeat(jnp.arange(n_scene_ref), n_scene)
    sj = jnp.tile(jnp.arange(n_scene), n_scene_ref)
    g1, g2, g3, g4 = ppf_features(sp_ref[si], sn_ref[si], sp[sj], sn[sj])
    sh = _quantize(g1, g2, g3, g4, angle_step, dist_step, table_size)
    alpha_s = _alpha(sp_ref[si], sn_ref[si], sp[sj])
    cand_ref = tbl_ref[sh]                    # [P,cap]
    cand_alpha = tbl_alpha[sh]
    ok = cand_ref >= 0
    d_alpha = alpha_s[:, None] - cand_alpha   # rotation to apply: [P,cap]
    a_bin = jnp.mod(
        jnp.floor((d_alpha + jnp.pi) / (2 * jnp.pi) * n_alpha).astype(jnp.int32),
        n_alpha,
    )
    # accumulator index: (scene_ref, model_ref, alpha_bin)
    acc_idx = (si[:, None] * n_model + jnp.clip(cand_ref, 0, n_model - 1)) \
        * n_alpha + a_bin
    acc_idx = jnp.where(ok, acc_idx, n_scene_ref * n_model * n_alpha)
    votes = jax.ops.segment_sum(
        ok.astype(jnp.int32).reshape(-1), acc_idx.reshape(-1),
        num_segments=n_scene_ref * n_model * n_alpha + 1,
    )[:-1]
    best = jnp.argmax(votes)
    n_votes = votes[best]
    b_sref = best // (n_model * n_alpha)
    b_mref = (best // n_alpha) % n_model
    b_alpha = (best % n_alpha + 0.5) / n_alpha * 2 * jnp.pi - jnp.pi

    # ---- pose recovery --------------------------------------------------
    # rotation taking model normal to scene normal, then alpha about it,
    # then translation aligning the reference points
    nm = mn[b_mref]
    ns = sn_ref[b_sref]
    v = jnp.cross(nm, ns)
    s = jnp.linalg.norm(v)
    c = jnp.dot(nm, ns)
    vx = jnp.array([[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]])
    R_align = jnp.eye(3) + vx + vx @ vx * ((1 - c) / jnp.maximum(s * s, _EPS))
    R_align = jnp.where(s < 1e-6, jnp.where(c > 0, jnp.eye(3), -jnp.eye(3)), R_align)
    # alpha rotation about the scene normal
    K = jnp.array([[0, -ns[2], ns[1]], [ns[2], 0, -ns[0]], [-ns[1], ns[0], 0]])
    R_alpha = jnp.eye(3) + jnp.sin(b_alpha) * K + (1 - jnp.cos(b_alpha)) * (K @ K)
    R = R_alpha @ R_align
    t = sp_ref[b_sref] - R @ mp[b_mref]
    return PPFResult(transform=from_rt(R, t), votes=n_votes,
                     valid=n_votes > 0)
