"""Multi-chip GICP: source points + covariances sharded, psum'd Gauss-Newton.

Distributed form of registration/gicp.py (reference: pcl::Generalized-
IterativeClosestPoint, registration/include/pcl/registration/gicp.h:75) for
the north-star config-4 scale-out. Layout:

- source shard [N/D, 3] per device (dp axis), target replicated;
- target covariances computed redundantly on every device (identical
  result, zero communication — cheaper than computing once + broadcast);
- source covariances need kNN neighborhoods that cross shard boundaries:
  ONE all_gather of the source (N*12 B, amortized over all iterations)
  reconstructs the full cloud per device, each shard then computes
  covariances only for its own points;
- each outer iteration: per-shard correspondences + Mahalanobis weights,
  then ``inner_iterations`` Gauss-Newton steps whose 6x6 system
  H = sum J^T M J, g = sum J^T M r is accumulated locally and psum'd —
  42 floats per inner step, independent of cloud size.

Communication per align(): 1 all_gather(N*12 B) +
(outer * inner) psums of ~50 floats over ICI.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from pcl_tpu.core import geometry
from pcl_tpu.core.transforms import se3_exp
from pcl_tpu.ops import batch33
from pcl_tpu.parallel.mesh import POINTS_AXIS
from pcl_tpu.search import bruteforce


def _reg_covs_local(qry_xyz, qry_mask, full_xyz, full_mask, k, epsilon):
    """Regularized GICP covariances of the shard's points against the FULL
    cloud (same math as registration/gicp.py regularized_covariances,
    reference gicp.hpp:73-139)."""
    idx, d2, valid = bruteforce.knn(full_xyz, full_mask, qry_xyz, k)
    nbr = full_xyz[jnp.clip(idx, 0, full_xyz.shape[0] - 1)]
    nbr_valid = valid & qry_mask[:, None]
    _, cov, cnt = geometry.mean_and_covariance(nbr, nbr_valid)
    lam, V = geometry.eigh33(cov)
    d = jnp.stack([
        jnp.full(lam.shape[:-1], epsilon, cov.dtype),
        jnp.ones(lam.shape[:-1], cov.dtype),
        jnp.ones(lam.shape[:-1], cov.dtype),
    ], axis=-1)
    C = jnp.einsum("...ik,...k,...jk->...ij", V, d, V)
    ok = (cnt >= 3.0) & qry_mask
    return jnp.where(ok[..., None, None], C, jnp.eye(3, dtype=cov.dtype))


def sharded_gicp(
    mesh: Mesh,
    src_xyz, src_mask, tgt_xyz, tgt_mask,
    init_transform=None,
    *,
    max_corr_dist=jnp.inf,
    max_iterations: int = 20,
    inner_iterations: int = 2,
    k_covariances: int = 20,
    epsilon: float = 1e-3,
    axis: str = POINTS_AXIS,
):
    """Full multi-chip GICP loop; returns (T [4,4] replicated, mse, iters).

    ``src_xyz``/``src_mask`` sharded over ``axis``; target replicated.
    """
    if init_transform is None:
        init_transform = jnp.eye(4, dtype=jnp.float32)
    max_d2 = jnp.float32(max_corr_dist) ** 2

    def body(src_sh, sm_sh, tx, tm, T0):
        # one all_gather rebuilds the full source for covariance kNN
        full_src = jax.lax.all_gather(src_sh, axis, tiled=True)
        full_sm = jax.lax.all_gather(sm_sh, axis, tiled=True)
        Cs = _reg_covs_local(src_sh, sm_sh, full_src, full_sm,
                             k_covariances, epsilon)
        Ct = _reg_covs_local(tx, tm, tx, tm, k_covariances, epsilon)
        CsL = batch33.to_lanes(Cs)
        CtL = batch33.to_lanes(Ct)
        sxL = batch33.vec_to_lanes(src_sh)

        def outer(carry):
            it, T, _mse = carry
            R, t = T[:3, :3], T[:3, 3]
            src_t = src_sh @ R.T + t
            idx, d2 = bruteforce.nn1(tx, tm, src_t)
            d2 = jnp.where(d2 <= max_d2, d2, jnp.inf)
            valid = sm_sh & jnp.isfinite(d2)
            w = valid.astype(jnp.float32)
            idxc = jnp.clip(idx, 0, tx.shape[0] - 1)
            q = batch33.vec_to_lanes(tx[idxc])
            Cq = batch33.gather(CtL, idxc)
            A = batch33.add_scaled_identity(
                Cq + batch33.sandwich(R, CsL), 1e-9)
            M = batch33.scale(batch33.inv(A), w)

            def gn_step(Tl, _):
                Rl, tl = Tl[:3, :3], Tl[:3, 3]
                p = Rl @ sxL + tl[:, None]
                r = p - q
                Mr = batch33.matvec(M, r)
                g_rho = jnp.sum(Mr, axis=1)
                cx = p[1] * Mr[2] - p[2] * Mr[1]
                cy = p[2] * Mr[0] - p[0] * Mr[2]
                cz = p[0] * Mr[1] - p[1] * Mr[0]
                g = jnp.concatenate([g_rho, jnp.stack([cx, cy, cz]).sum(axis=1)])
                H_tt = jnp.sum(M, axis=1).reshape(3, 3)
                zero = jnp.zeros_like(p[0])
                Px = jnp.stack([zero, -p[2], p[1],
                                p[2], zero, -p[0],
                                -p[1], p[0], zero])
                MPx = batch33.matmul(M, Px)
                H_tw = -jnp.sum(MPx, axis=1).reshape(3, 3)
                H_ww = jnp.sum(batch33.matmul(batch33.transpose(Px), MPx),
                               axis=1).reshape(3, 3)
                H = jnp.block([[H_tt, H_tw], [H_tw.T, H_ww]])
                # ONE fused psum of the 6x6 system + gradient (42+6 floats)
                Hg = jax.lax.psum(
                    jnp.concatenate([H.reshape(-1), g]), axis)
                H = Hg[:36].reshape(6, 6)
                g = Hg[36:]
                H = H + 1e-6 * jnp.trace(H) / 6.0 * jnp.eye(6)
                xi = -jnp.linalg.solve(H, g)
                return se3_exp(xi) @ Tl, None

            T_new, _ = jax.lax.scan(gn_step, T, None, length=inner_iterations)
            stats = jax.lax.psum(
                jnp.stack([jnp.sum(w * jnp.where(valid, d2, 0.0)), jnp.sum(w)]),
                axis)
            mse = stats[0] / jnp.maximum(stats[1], 1.0)
            return it + 1, T_new, mse

        def cond(carry):
            return carry[0] < max_iterations

        it, T, mse = jax.lax.while_loop(
            cond, outer, (jnp.int32(0), T0, jnp.float32(jnp.inf)))
        return T, mse, it

    spec_pt = P(axis)
    fn = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(axis, None), spec_pt, P(), P(), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(fn)(src_xyz, src_mask, tgt_xyz, tgt_mask,
                       init_transform.astype(jnp.float32))
