"""Pallas TPU kernel: fused candidate compute for the blocked NN sweep.

The windowed-span blocked sweep (search/cell_list.py nn1_radius_blocked)
splits into (1) an 8-row span gather per query — issue-rate-bound at the
measured HBM gather floor — and (2) the candidate compute over the packed
[B, 8*cap*4] rows: squared distances per slot, penalty masking, winner
selection, truncation detection. In XLA, (2) had to be expressed as 0/1
projection matmuls ([B,L]@[L,S] etc., ~3 of them) to dodge bad layouts —
~18 ms/iter of MXU time at 1M queries plus block-loop scheduling slack
(BASELINE.md roofline; VERDICT r3 weak #1).

This kernel does (2) the natural way, entirely in VMEM per query tile:

- the intra-slot coordinate sum (lanes 4s..4s+2) is two LANE ROLLS and two
  adds on the VPU instead of a [B,L]x[L,S] matmul;
- the winner is a lane-argmin (first-match via a min over lane ids), and
  its (x, y, z, idx) lanes are read back with three rolled one-hot
  multiplies + row sums instead of two more projection matmuls;
- truncation is a masked row-sum of negative idx lanes.

Per-element work drops from ~3 MXU matmul passes to ~10 VPU passes over
the tile, and everything between the gathered rows and the 8-lane result
stays in VMEM. Matches the hot loop of the reference's ICP correspondence
step (reference: registration/impl/icp.hpp:115-239 — per-source-point
nearestKSearch; here the batched dense-grid equivalent).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 1e30


def _sweep_kernel(r2_ref, rows_ref, qb_ref, ok_ref, out_ref):
    L = rows_ref.shape[1]
    C4 = L // 8
    rows = rows_ref[:]                                     # [bq, L]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, L), 1)  # [1, L]
    k4 = lane % 4
    # query broadcast: qb [bq,4] -> lane 4s+k gets q[k] (tiny MXU matmul)
    T4 = (jax.lax.broadcasted_iota(jnp.int32, (4, L), 0) == k4
          ).astype(jnp.float32)                            # [4, L]
    qbl = jnp.dot(qb_ref[:], T4, preferred_element_type=jnp.float32)
    is_coord = (k4 < 3).astype(jnp.float32)
    diff = jnp.clip((rows - qbl) * is_coord, -1e15, 1e15)
    sq = diff * diff
    # slot distance at its x-lane: sq[4s] + sq[4s+1] + sq[4s+2]
    # (pltpu.roll wants non-negative shifts: roll by L-k == roll by -k)
    s3 = sq + pltpu.roll(sq, L - 1, 1) + pltpu.roll(sq, L - 2, 1)
    # bucket validity: ok [bq,8] -> its C4 lanes (tiny MXU matmul)
    E8 = (jax.lax.broadcasted_iota(jnp.int32, (8, L), 0) == lane // C4
          ).astype(jnp.float32)                            # [8, L]
    ok_lanes = jnp.dot(ok_ref[:], E8, preferred_element_type=jnp.float32)
    r2 = r2_ref[0, 0]
    live = (k4 == 0) & (ok_lanes > 0.0) & (s3 <= r2)
    cand = jnp.where(live, s3, _BIG)                       # [bq, L]
    best = jnp.min(cand, axis=1, keepdims=True)            # [bq, 1]
    # first-match winner lane (ties -> lowest lane = lowest slot, the XLA
    # path's cumsum-one-hot tie-break)
    lanef = jnp.broadcast_to(lane.astype(jnp.float32), cand.shape)
    winlane = jnp.min(jnp.where(cand == best, lanef, 3e9), axis=1,
                      keepdims=True)
    sel = (lanef == winlane).astype(jnp.float32)           # one-hot at x lane
    winx = jnp.sum(rows * sel, axis=1, keepdims=True)
    winy = jnp.sum(rows * pltpu.roll(sel, 1, 1), axis=1, keepdims=True)
    winz = jnp.sum(rows * pltpu.roll(sel, 2, 1), axis=1, keepdims=True)
    wini = jnp.sum(rows * pltpu.roll(sel, 3, 1), axis=1, keepdims=True)
    # truncation: any sign-encoded (negative) idx lane in a probed bucket
    tneg = jnp.where((k4 == 3) & (ok_lanes > 0.0) & (rows < 0.0), 1.0, 0.0)
    trunc = (jnp.sum(tneg, axis=1, keepdims=True) > 0.0).astype(jnp.float32)
    d2 = jnp.where(best >= 0.5 * _BIG, jnp.inf, best)
    pad = jnp.zeros_like(d2)
    out_ref[:] = jnp.concatenate(
        [d2, wini, trunc, winx, winy, winz, pad, pad], axis=1)


@functools.partial(jax.jit, static_argnames=("bq", "interpret"))
def sweep_compute(
    rows: jax.Array,     # [B, 8*cap*4] packed gathered rows
    qb: jax.Array,       # [B, 3] query coordinates
    ok: jax.Array,       # [B, 8] bool bucket validity (in grid AND in span)
    r2,                  # scalar gate (squared radius)
    bq: int = 256,
    interpret: bool = False,
):
    """Fused winner selection over gathered candidate rows.

    Returns (best_d2 [B] f32 (+inf if none), win_idx_f [B] f32 (still
    sign-encoded), trunc [B] bool, win_xyz [B,3] f32). Requires the lane
    count 8*cap*4 to be a multiple of 128 (cap % 4 == 0).
    """
    B, L = rows.shape
    if L % 128 != 0:
        raise ValueError(f"lane count {L} not a multiple of 128")
    pad_b = (-B) % bq
    if pad_b:
        rows = jnp.pad(rows, ((0, pad_b), (0, 0)), constant_values=_BIG)
        qb = jnp.pad(qb, ((0, pad_b), (0, 0)))
        ok = jnp.pad(ok, ((0, pad_b), (0, 0)))
    q4 = jnp.pad(qb, ((0, 0), (0, 1)))
    okf = ok.astype(jnp.float32)
    r2a = jnp.asarray(r2, jnp.float32).reshape(1, 1)
    nb = rows.shape[0] // bq

    out = pl.pallas_call(
        _sweep_kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((bq, L), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bq, 4), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bq, 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bq, 8), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows.shape[0], 8), jnp.float32),
        interpret=interpret,
    )(r2a, rows, q4, okf)

    out = out[:B]
    return out[:, 0], out[:, 1], out[:, 2] > 0.5, out[:, 3:6]
