"""Pallas TPU kernel: fused 1-nearest-neighbor (the ICP correspondence op).

The XLA brute-force path (search/bruteforce.py) materializes [chunk, tile]
distance blocks through HBM; at 120k x 120k that is ~58 GB of HBM traffic
per sweep and wholly bandwidth-bound. This kernel keeps everything in VMEM:

- grid (query_tiles, target_tiles), target innermost so each query tile's
  running best stays VMEM-resident across the whole target sweep;
- the -2 q.t term comes from the MXU (queries pre-scaled by -2 so the
  product IS -2qt), the ||t||^2 row rides along and the per-pair work on the
  VPU is one add + the min/argmin reduction;
- ||q||^2 is a per-row constant — irrelevant to argmin — so true squared
  distances are reconstructed once per query afterwards, not per pair.

Total HBM traffic: ~(Nq/QT) * M * 16 bytes (~1 GB for 120k x 120k) instead
of 58 GB. Masked targets carry ||t||^2 = +BIG so they never win.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 1e30  # python float: used as a literal inside the kernel


def _nn1_kernel(qneg_ref, t_ref, t2_ref, idx_ref, val_ref):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        val_ref[:] = jnp.full_like(val_ref, _BIG)
        idx_ref[:] = jnp.zeros_like(idx_ref)

    # [QT,3] x [3,TT] on the MXU; queries are pre-scaled by -2
    m = jnp.dot(qneg_ref[:], t_ref[:], preferred_element_type=jnp.float32)
    s = m + t2_ref[:]                       # [QT,TT]; invalid targets -> ~BIG
    tile_min = jnp.min(s, axis=1, keepdims=True)
    tile_arg = jnp.argmin(s, axis=1).astype(jnp.int32)[:, None]
    tt = s.shape[1]
    better = tile_min < val_ref[:]
    val_ref[:] = jnp.where(better, tile_min, val_ref[:])
    idx_ref[:] = jnp.where(better, tile_arg + j * tt, idx_ref[:])


@functools.partial(jax.jit, static_argnames=("qt", "tt", "interpret"))
def nn1_pallas(
    target: jax.Array,
    tmask: jax.Array,
    queries: jax.Array,
    qt: int = 512,
    tt: int = 2048,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Exact masked 1-NN: returns (index [Q] int32, sqdist [Q] f32).
    sqdist is +inf where no valid target exists."""
    Q = queries.shape[0]
    M = target.shape[0]
    pad_q = (-Q) % qt
    pad_m = (-M) % tt
    q = jnp.pad(queries, ((0, pad_q), (0, 0)))
    t = jnp.pad(target, ((0, pad_m), (0, 0)))
    tm = jnp.pad(tmask, (0, pad_m))
    t2 = jnp.where(tm, jnp.sum(t * t, axis=-1), _BIG)
    # pad the coordinate axis 3 -> 8 (zero rows contribute nothing to the
    # contraction; avoids relying on Mosaic masking a K=3 matmul)
    qneg = jnp.pad(-2.0 * q, ((0, 0), (0, 5)))
    t_T = jnp.pad(t, ((0, 0), (0, 5))).T        # [8, Mp]
    nq, nt = q.shape[0] // qt, t.shape[0] // tt

    idx, val = pl.pallas_call(
        _nn1_kernel,
        grid=(nq, nt),
        in_specs=[
            pl.BlockSpec((qt, 8), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, tt), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tt), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((qt, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((qt, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((q.shape[0], 1), jnp.int32),
            jax.ShapeDtypeStruct((q.shape[0], 1), jnp.float32),
        ],
        interpret=interpret,
    )(qneg, t_T, t2[None, :])

    idx = idx[:Q, 0]
    # reconstruct true squared distance for the winners only
    best_t = t[idx]
    valid = tm[idx]
    d2 = jnp.sum((queries - best_t) ** 2, axis=-1)
    d2 = jnp.where(valid, d2, jnp.inf)
    return idx, d2


def nn1_auto(target, tmask, queries, **kw):
    """Pallas on TPU, XLA fallback elsewhere."""
    if jax.default_backend() in ("tpu", "axon"):
        return nn1_pallas(target, tmask, queries, **kw)
    from pcl_tpu.search import bruteforce
    return bruteforce.nn1(target, tmask, queries)
