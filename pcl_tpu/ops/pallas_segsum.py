"""Pallas TPU kernel: segmented sum over SORTED segments (VERDICT r4 #9).

The voxel-grid centroid step (filters/voxel_grid.py; reference
filters/impl/voxel_grid.hpp:597-725 sort -> segment walk) spends ~7 ms of
its 12.6 on four single-lane ``segment_sum`` scatter-adds at the 307k
fixture. After the cell sort the segment ids are MONOTONE with step 0/1 —
a structure XLA's scatter lowering ignores. This kernel exploits it:

- the sorted points stream through VMEM in fixed chunks of C (the
  segment ids ride lane W of the 128-lane input rows);
- within a chunk, per-segment sums are ONE one-hot MXU matmul
  (``ET [C+8, C] @ vin [C, 128]`` — a chunk spans at most C+1 segments;
  the row count is padded to C+8 because VMEM scratch and DMA lengths
  must be sublane(8)-aligned, measured hard-fault otherwise);
- the chunk's rows land in the output at its first segment id (prefetched
  scalar offsets + async DMA from scratch into the ANY-space output);
- the boundary segment that continues into the next chunk is carried in
  VMEM/SMEM scratch across the sequential grid and added to that chunk's
  row 0; a later chunk overwrites the provisional partial (and the 7
  alignment-pad rows) of its predecessor, so every live output row ends
  with its final value.

Sequential-grid carry + dynamic-offset DMA replace the scatter entirely:
the only HBM traffic is one sorted-input read and one write per output
row (x32 lane padding).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _segsum_kernel(starts_ref, vin_ref, out_ref, acc_ref, carry_ref,
                   last_ref, sem_ref, *, W: int):
    C = vin_ref.shape[0]
    E = C + 8                                  # sublane-aligned row count
    k = pl.program_id(0)
    s0 = starts_ref[k]
    vin = vin_ref[:]                           # [C, 128]; lane W = rel id
    rel = vin[:, W].astype(jnp.int32)
    # one-hot ET[s, i] = (rel[i] == s): [E, C]
    srow = jax.lax.broadcasted_iota(jnp.int32, (E, C), 0)
    ET = (srow == rel[None, :]).astype(jnp.float32)
    local = jnp.dot(ET, vin, preferred_element_type=jnp.float32)  # [E,128]
    # continuing segment from the previous chunk: add its carried partial
    # to row 0 (no scatter — Pallas TPU has no scatter-add lowering)
    cont = (k > 0) & (last_ref[0] == s0)
    carry_row = jnp.where(cont, carry_ref[0, :], 0.0)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (E, 128), 0)
    local = local + jnp.where(row_ids == 0, carry_row[None, :], 0.0)
    acc_ref[:] = local
    # stash this chunk's open-segment partial (ref read with pl.ds —
    # value-level dynamic_slice has no Pallas TPU lowering)
    last_rel = rel[C - 1]
    carry_ref[0, :] = acc_ref[pl.ds(last_rel, 1), :][0, :]
    last_ref[0] = s0 + last_rel
    # write all E rows at s0; rows past the open segment are provisional
    # and rewritten by the next chunk (its s0' = s0 + last_rel <= s0 + C)
    dma = pltpu.make_async_copy(
        acc_ref, out_ref.at[pl.ds(s0, E), :], sem_ref)
    dma.start()
    dma.wait()


@functools.partial(jax.jit, static_argnames=("chunk", "interpret"))
def segment_sum_sorted(vals: jax.Array, seg: jax.Array, chunk: int = 512,
                       interpret: bool = False) -> jax.Array:
    """Segment sums of ``vals [N, W]`` (zero rows for invalid points) over
    MONOTONE segment ids ``seg [N]`` (step 0/1 among valid points; invalid
    tail may hold any larger value). Returns ``[N, W]`` — row s is the sum
    over seg==s; rows beyond the last real segment are zeros/garbage
    (caller masks by its segment count). W <= 120.
    """
    N, W = vals.shape
    C = chunk
    E = C + 8
    nb = -(-N // C)
    Np = nb * C
    if Np != N:
        vals = jnp.pad(vals, ((0, Np - N), (0, 0)))
        seg = jnp.concatenate([seg, jnp.broadcast_to(seg[-1], (Np - N,))])
    # chunk start segments; chunks starting beyond the last real output
    # row are redirected into the trash zone [N, N + E) of the output
    starts = jnp.minimum(seg[::C], jnp.int32(N))            # [nb]
    rel = jnp.clip(seg - jnp.repeat(starts, C), 0, C)
    # 128-lane fused input: vals in lanes [0, W), rel id in lane W
    # (f32-exact for rel <= C < 2^24)
    vin = jnp.zeros((Np, 128), jnp.float32)
    vin = vin.at[:, :W].set(vals).at[:, W].set(rel.astype(jnp.float32))
    out = pl.pallas_call(
        functools.partial(_segsum_kernel, W=W),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nb,),
            in_specs=[
                pl.BlockSpec((C, 128), lambda i, s: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[
                pltpu.VMEM((E, 128), jnp.float32),
                pltpu.VMEM((8, 128), jnp.float32),
                pltpu.SMEM((1,), jnp.int32),
                pltpu.SemaphoreType.DMA(()),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((Np + E, 128), jnp.float32),
        interpret=interpret,
    )(starts, vin)
    return out[:N, :W]


@functools.partial(jax.jit, static_argnames=("chunk", "interpret"))
def voxel_sums_pallas(columns, mask, lin, chunk: int = 512,
                      interpret: bool = False):
    """Voxel segment sums of ``columns [N, W]`` keyed on dense linear cell
    ids ``lin [N]`` (invalid points marked with INT32_MAX): dense-id
    payload sort (the columns ride the key sort — the back-permute scatter
    and every per-lane ``segment_sum`` scatter of the XLA path disappear)
    + the chunked segmented-reduce kernel. Returns (sums [N, W] compacted
    in cell order, n_voxels). W <= 119 (one lane carries the sort weight,
    one the rel id)."""
    n = columns.shape[0]
    big = jnp.int32(2**31 - 1)
    w0 = mask.astype(jnp.float32)
    cols = tuple(columns[:, i] * w0 for i in range(columns.shape[1]))
    sorted_all = jax.lax.sort((lin,) + cols + (w0,), num_keys=1)
    key = sorted_all[0]
    valid_s = key != big
    first = (key != jnp.roll(key, 1)).at[0].set(True) & valid_s
    seg = jnp.cumsum(first.astype(jnp.int32)) - 1
    seg = jnp.where(valid_s, seg, jnp.int32(n))
    vals = jnp.stack(sorted_all[1:], axis=1)          # [N, W+1] (.., w)
    vals = jnp.where(valid_s[:, None], vals, 0.0)
    sums = segment_sum_sorted(vals, seg, chunk=chunk, interpret=interpret)
    n_voxels = jnp.sum(first.astype(jnp.int32))
    return sums, n_voxels


@functools.partial(jax.jit, static_argnames=("chunk", "interpret"))
def voxel_centroids_pallas(cloud, leaf_size, chunk: int = 512,
                           interpret: bool = False):
    """VoxelGrid centroid path over ``voxel_sums_pallas``. Returns
    (centroids [N,3], mask [N]) with centroids compacted in cell order,
    exactly like filters.voxel_downsample."""
    xyz, mask = cloud.xyz, cloud.mask
    n = xyz.shape[0]
    lin = dense_cell_ids(xyz, mask, leaf_size)
    sums, n_voxels = voxel_sums_pallas(xyz, mask, lin, chunk=chunk,
                                       interpret=interpret)
    out_mask = jnp.arange(n, dtype=jnp.int32) < n_voxels
    cents = sums[:, :3] / jnp.maximum(sums[:, 3:4], 1.0)
    return jnp.where(out_mask[:, None], cents, 0.0), out_mask


def dense_cell_ids(xyz, mask, leaf_size):
    """Row-major dense linear cell id over the masked bbox (INT32_MAX for
    invalid points) — the voxel_grid dense-id scheme."""
    big = jnp.int32(2**31 - 1)
    leaf = jnp.broadcast_to(jnp.asarray(leaf_size, jnp.float32), (3,))
    coords = jnp.floor(xyz / leaf).astype(jnp.int32)
    cmin = jnp.min(jnp.where(mask[:, None], coords, big), axis=0)
    cmax = jnp.max(jnp.where(mask[:, None], coords, -big), axis=0)
    span = jnp.maximum(cmax - cmin + 1, 1)
    rel = jnp.clip(coords - cmin[None, :], 0, None)
    lin = (rel[:, 2] * span[1] + rel[:, 1]) * span[0] + rel[:, 0]
    return jnp.where(mask, lin, big)
