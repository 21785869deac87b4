"""Iterative Closest Point — the canonical registration loop, fully on device.

Re-design of pcl::IterativeClosestPoint (reference: registration/impl/
icp.hpp:115-267 and the hot loop :164-239). PCL's per-iteration structure —
correspondence search, rejection, estimation, convergence check — becomes the
body of a single ``jax.lax.while_loop`` under jit: zero host round-trips,
correspondences from an MXU-tiled 1-NN sweep, estimation a closed-form
masked reduction.

Variants (reference icp.h bottom / icp_nl.h):
- "point_to_point": SVD/Umeyama estimation (classic ICP)
- "point_to_plane": linearized LLS on target normals
  (IterativeClosestPointWithNormals)
- "symmetric": symmetric point-to-plane (needs source + target normals)

Convergence mirrors DefaultConvergenceCriteria (reference:
registration/include/pcl/registration/default_convergence_criteria.h:65-79):
max iterations / transform increment epsilon (translation + rotation) /
absolute or relative MSE. State codes in ICPResult.convergence_state.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

import numpy as np

from pcl_tpu.core.cloud import Cloud, ATTR_NORMAL
from pcl_tpu.core.transforms import transform_points, transform_cloud, rotation_angle
from pcl_tpu.registration import correspondence as corr_mod
from pcl_tpu.registration import estimation
from pcl_tpu.search import cell_list

# convergence_state codes
CONV_RUNNING = 0
CONV_ITERATIONS = 1
CONV_TRANSFORM = 2
CONV_ABS_MSE = 3
CONV_REL_MSE = 4
CONV_FAILED_CORRESPONDENCES = -1


class ICPResult(NamedTuple):
    transform: jax.Array            # [4,4] final source -> target transform
    converged: jax.Array            # bool
    iterations: jax.Array           # int32
    fitness: jax.Array              # f32 mean squared correspondence distance
    num_correspondences: jax.Array  # int32 at the final iteration
    convergence_state: jax.Array    # int32, CONV_* code
    truncated: jax.Array            # bool: any cell-list bucket overflowed (or
                                    # a blocked-sweep span missed) at ANY
                                    # iteration — correspondences may have been
                                    # non-nearest; raise cell_cap if set.
                                    # Always False on the brute-force backend.


def _gather(tgt: jax.Array, idx: jax.Array) -> jax.Array:
    return tgt[jnp.clip(idx, 0, tgt.shape[0] - 1)]


@partial(
    jax.jit,
    static_argnames=(
        "max_corr_dist", "max_iterations", "variant", "reciprocal",
        "min_correspondences", "corr_backend", "cell_cap", "table_size",
        "grid_dims",
    ),
)
def icp(
    source: Cloud,
    target: Cloud,
    init_transform: Optional[jax.Array] = None,
    *,
    max_corr_dist: float = jnp.inf,
    max_iterations: int = 50,
    transformation_eps: float = 0.0,
    abs_mse_eps: float = 1e-12,
    rel_mse_eps: float = 1e-8,
    variant: str = "point_to_point",
    reciprocal: bool = False,
    min_correspondences: int = 3,
    corr_backend: str = "auto",
    cell_cap: int = 32,
    table_size: int = 1 << 17,
    grid_dims=None,
    index: Optional[cell_list.CellTable] = None,
) -> ICPResult:
    """Align ``source`` onto ``target``; returns the 4x4 transform + stats.

    All tolerances follow the reference defaults; ``transformation_eps``
    doubles as translation(^2) and (1-cos rotation) thresholds like
    Registration::setTransformationEpsilon feeding DefaultConvergenceCriteria.

    ``grid_dims`` (static (Cx,Cy,Cz)) switches the cell backend to the
    dense collision-free grid: hash tables merge distinct cells' populations
    birthday-style (inflating bucket overflow) and scatter neighboring cells
    across HBM; the dense grid is exact and gathers locally. Pick dims ~
    ceil(extent / (2*max_corr_dist)) + 1 per axis.
    """
    if init_transform is None:
        init_transform = jnp.eye(4, dtype=jnp.float32)
    if index is not None and reciprocal:
        # the cell path (forced by a prebuilt index) implements one-way NN
        # only; silently ignoring reciprocal=True would change semantics
        raise ValueError("reciprocal=True is incompatible with a prebuilt "
                         "index (cell backend is one-way NN)")
    needs_tn = variant in ("point_to_plane", "symmetric")
    if needs_tn and ATTR_NORMAL not in target.attrs:
        raise ValueError(f"icp variant {variant!r} requires target normals")
    if variant == "symmetric" and ATTR_NORMAL not in source.attrs:
        raise ValueError("symmetric icp requires source normals")

    sx, sm = source.xyz, source.mask
    tx, tm = target.xyz, target.mask
    tn = target.attrs.get(ATTR_NORMAL)
    sn = source.attrs.get(ATTR_NORMAL)

    # correspondence backend: with a finite gate, nearest-within-r from the
    # dense cell list (built ONCE from the static target and reused by every
    # iteration — the tree-build amortization of Registration::initCompute,
    # reference registration.hpp:85, in TPU form)
    finite_gate = bool(np.isfinite(max_corr_dist))
    # auto: cell list only when brute force is genuinely expensive (>1e8
    # candidate pairs) — small clouds are faster AND exact on the MXU, and
    # dense small clouds overflow r-sized buckets
    big = source.capacity * target.capacity > 1e8
    use_cells = (index is not None) or (corr_backend == "cell") or (
        corr_backend == "auto" and finite_gate and big and not reciprocal
    )
    if use_cells:
        if not finite_gate:
            raise ValueError("corr_backend='cell' requires finite max_corr_dist")
        if index is not None:
            # prebuilt target index (build_index) — the setInputTarget
            # amortization: reuse one table across many align() calls
            # (reference registration.hpp:85 builds the kd-tree once per
            # target). Must have been built with cell = 2*max_corr_dist.
            table = index
            if table.dims is not None:
                grid_dims = table.dims
        else:
            # cell = 2r enables the 8-cell gather scheme (see cell_list)
            table = cell_list.build(
                tx, tm, jnp.float32(2.0 * max_corr_dist),
                table_size=table_size, cap=cell_cap, dims=grid_dims,
            )
        # sort the source once so spatially adjacent queries hit nearby
        # table rows — the slab gathers then read HBM near-sequentially
        # every iteration (ICP permutes correspondences; the estimation
        # reductions are permutation-invariant). Dense tables sort by the
        # table's own row-major linear id (exactly its memory order);
        # hash tables fall back to morton.
        if grid_dims is not None:
            skey = cell_list._dense_id(
                cell_list._query_coords(table, sx), grid_dims)
            mkey = jnp.where(sm, skey, jnp.int32(2**31 - 1))
        else:
            from pcl_tpu.octree.linear import morton_encode
            cell0 = jnp.clip(
                jnp.floor((sx - jnp.min(jnp.where(sm[:, None], sx, jnp.inf), axis=0))
                          / jnp.float32(2.0 * max_corr_dist)).astype(jnp.int32),
                0, 1023,
            )
            mkey = jnp.where(sm, morton_encode(cell0), jnp.int32(2**31 - 1))
        morder = jnp.argsort(mkey)
        sx = sx[morder]
        sm = sm[morder]
        if sn is not None:
            sn = sn[morder]

        # very large dense tables fall off the TPU gather-rate cliff
        # (measured v5e: 336 M rows/s from a 25 MB operand -> ~19 M from
        # 210 MB); switch to the windowed-span blocked sweep, which works
        # on the dense-id-sorted source this path already prepares
        table_bytes = (table.table_size + 1) * table.cap * 16
        use_blocked = table.dims is not None and table_bytes > 48e6
        if use_blocked:
            span_rows = 131072
            n_blocks = max(1, -(-2 * (table.table_size + 1) // span_rows))
            block_q = max(8192, -(-source.capacity // n_blocks))

        def det(src_t, src_mask, _tx, _tm, max_dist):
            if use_blocked:
                # with_dst: the winner's coordinates come out of the packed
                # rows the sweep already gathered, skipping the tgt[idx]
                # re-gather in estimation (~13 ms/iter at 1M)
                idx, d2, trunc, dst = cell_list.nn1_radius_blocked(
                    table, src_t, max_dist,
                    block_queries=block_q, span_rows=span_rows,
                    with_dst=True)
            else:
                idx, d2, trunc = cell_list.nn1_radius(
                    table, src_t, max_dist, compact=True)
                dst = None
            valid = src_mask & jnp.isfinite(d2)
            # truncation matters only where a masked query actually looked
            return (corr_mod.Correspondences(idx, d2, valid),
                    jnp.any(trunc & src_mask), dst)
    else:
        _det0 = corr_mod.determine_reciprocal_correspondences if reciprocal \
            else corr_mod.determine_correspondences

        def det(src_t, src_mask, _tx, _tm, max_dist):
            return _det0(src_t, src_mask, _tx, _tm, max_dist), \
                jnp.bool_(False), None

    def iteration(T):
        """One ICP iteration from accumulated transform T. Returns
        (T_new, mse, n_corr)."""
        src_t = transform_points(T, sx)
        c, trunc, dst = det(src_t, sm, tx, tm, max_corr_dist)
        w = c.valid.astype(jnp.float32)
        n_corr = jnp.sum(c.valid.astype(jnp.int32))
        if dst is None:
            dst = _gather(tx, c.index)
        # invalid rows may carry garbage winner coords (e.g. _BIG empties);
        # they are zero-weighted, but keep them finite for the reductions
        dst = jnp.where(c.valid[:, None], dst, 0.0)
        if variant == "point_to_point":
            T_delta = estimation.estimate_svd(src_t, dst, w)
        elif variant == "point_to_plane":
            nrm = _gather(tn, c.index)
            T_delta = estimation.estimate_point_to_plane(src_t, dst, nrm, w)
        elif variant == "symmetric":
            R = T[:3, :3]
            sn_t = sn @ R.T
            nrm = _gather(tn, c.index)
            T_delta = estimation.estimate_symmetric_point_to_plane(src_t, sn_t, dst, nrm, w)
        else:
            raise ValueError(f"unknown icp variant {variant!r}")
        mse = jnp.sum(w * c.sqdist) / jnp.maximum(jnp.sum(w), 1.0)
        # degenerate: too few correspondences -> freeze
        ok = n_corr >= min_correspondences
        T_delta = jnp.where(ok, T_delta, jnp.eye(4, dtype=T.dtype))
        return T_delta @ T, T_delta, mse, n_corr, ok, trunc

    def cond(state):
        it, T, prev_mse, mse, n_corr, code, trunc = state
        return (it < max_iterations) & (code == CONV_RUNNING)

    def body(state):
        it, T, prev_mse, mse, n_corr, code, trunc = state
        T_new, T_delta, mse_new, n_corr_new, ok, trunc_new = iteration(T)
        it = it + 1
        # convergence checks on the increment (reference
        # default_convergence_criteria.h:72-79)
        t2 = jnp.sum(T_delta[:3, 3] ** 2)
        cos_r = jnp.clip((jnp.trace(T_delta[:3, :3]) - 1.0) * 0.5, -1.0, 1.0)
        small_transform = (t2 <= transformation_eps) & ((1.0 - cos_r) <= transformation_eps)
        small_transform = small_transform & (transformation_eps > 0.0)
        abs_ok = jnp.abs(mse_new - mse) < abs_mse_eps
        rel_ok = jnp.abs(mse_new - mse) < rel_mse_eps * jnp.abs(mse)
        code = jnp.where(
            ~ok,
            CONV_FAILED_CORRESPONDENCES,
            jnp.where(
                small_transform,
                CONV_TRANSFORM,
                jnp.where(
                    abs_ok & (it > 1),
                    CONV_ABS_MSE,
                    jnp.where(
                        rel_ok & (it > 1),
                        CONV_REL_MSE,
                        jnp.where(it >= max_iterations, CONV_ITERATIONS, CONV_RUNNING),
                    ),
                ),
            ),
        ).astype(jnp.int32)
        # OR-accumulate: mid-run truncation must surface even if the final
        # iteration happens to be clean (ADVICE r2)
        return (it, T_new, mse, mse_new, n_corr_new, code, trunc | trunc_new)

    state0 = (
        jnp.int32(0),
        init_transform.astype(jnp.float32),
        jnp.float32(jnp.inf),
        jnp.float32(jnp.inf),
        jnp.int32(0),
        jnp.int32(CONV_RUNNING),
        jnp.bool_(False),
    )
    it, T, prev_mse, mse, n_corr, code, trunc = jax.lax.while_loop(cond, body, state0)
    converged = code > 0
    return ICPResult(
        transform=T,
        converged=converged,
        iterations=it,
        fitness=mse,
        num_correspondences=n_corr,
        convergence_state=code,
        truncated=trunc,
    )


def build_index(
    target: Cloud,
    max_corr_dist: float,
    *,
    cell_cap: int = 32,
    table_size: int = 1 << 17,
    grid_dims=None,
) -> cell_list.CellTable:
    """Prebuild the target cell-list for ``icp(..., index=...)`` — the
    setInputTarget analog (reference registration.hpp:85): pay the one-time
    index build once and reuse it across align() calls / restarts. The cell
    size is tied to ``max_corr_dist`` (cell = 2r for the 8-cell gather), so
    reuse only with the same gate."""
    return cell_list.build(
        target.xyz, target.mask, jnp.float32(2.0 * max_corr_dist),
        table_size=table_size, cap=cell_cap, dims=grid_dims,
    )


def fitness_score(
    source: Cloud, target: Cloud, transform: jax.Array, max_range: float = jnp.inf
) -> jax.Array:
    """Mean squared distance to nearest target point under ``transform``
    (reference: Registration::getFitnessScore, registration/impl/
    registration.hpp — mean of squared NN distances below max_range)."""
    src_t = transform_points(transform, source.xyz)
    c = corr_mod.determine_correspondences(src_t, source.mask, target.xyz, target.mask, max_range)
    w = c.valid.astype(jnp.float32)
    return jnp.sum(w * c.sqdist) / jnp.maximum(jnp.sum(w), 1.0)


def align(source: Cloud, target: Cloud, **kw):
    """Run ICP and return (aligned_source_cloud, ICPResult) — the
    Registration::align(output) convenience (reference: registration.hpp:172)."""
    res = icp(source, target, **kw)
    return transform_cloud(res.transform, source), res
