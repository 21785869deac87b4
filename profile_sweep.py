"""Stage isolation for the blocked 1M NN sweep (what dominates: span
slice, row gather, distance math, or argmin?). Writes PROFILE_SWEEP.json."""

import json
import sys
import time
from functools import partial

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import jax.numpy as jnp
import numpy as np

from pcl_tpu.search import cell_list


def _time_ms(fn, reps=5):
    out = fn()
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return round(min(ts) * 1e3, 2)


def main():
    n = 1_000_000
    r = 0.5
    dims = (103, 103, 103)
    cap = 12
    rng = np.random.default_rng(0)
    tgt = rng.uniform(-50, 50, size=(n, 3)).astype(np.float32)
    src = tgt + rng.normal(scale=0.05, size=(n, 3)).astype(np.float32)
    mask = jnp.ones((n,), bool)
    tgt_j, src_j = jnp.asarray(tgt), jnp.asarray(src)
    table = cell_list.build(tgt_j, mask, jnp.float32(2 * r), cap=cap, dims=dims)
    jax.block_until_ready(table.data)
    skey = cell_list._dense_id(cell_list._query_coords(table, src_j), dims)
    qs = src_j[jnp.argsort(skey)]
    jax.block_until_ready(qs)

    span_rows = 131072
    R = table.table_size
    n_blocks = max(1, -(-2 * (R + 1) // span_rows))
    bq = max(8192, -(-n // n_blocks))
    Q = qs.shape[0]
    nb = -(-Q // bq)
    Qpad = nb * bq
    qp = jnp.concatenate([qs, jnp.full((Qpad - Q, 3), 1e30, jnp.float32)])
    cx, cy, cz = dims
    strides = jnp.asarray([(i * cy + j) * cz + k for i in (0, 1)
                           for j in (0, 1) for k in (0, 1)], jnp.int32)
    out = {"blocks": nb, "block_queries": bq, "span_rows": span_rows}

    def common(b):
        qb = jax.lax.dynamic_slice(qp, (b * bq, 0), (bq, 3))
        base = jnp.floor((qb - r - table.origin) / table.cell_size).astype(jnp.int32)
        bid = (base[:, 0] * cy + base[:, 1]) * cz + base[:, 2]
        ids = bid[:, None] + strides[None, :]
        realq = qb[:, 0] < 1e29
        idmin = jnp.min(jnp.where(realq[:, None], jnp.clip(ids, 0, R), R))
        span_start = jnp.clip(idmin, 0, max(R + 1 - span_rows, 0))
        local = jnp.clip(ids - span_start, 0, span_rows - 1)
        return qb, local, span_start

    # A: addressing + span slice only
    @jax.jit
    def stage_a():
        def blk(b):
            qb, local, span_start = common(b)
            span = jax.lax.dynamic_slice(
                table.data, (span_start, 0), (span_rows, cap * 4))
            return jnp.sum(span[:8, :8]) + jnp.sum(local[:8].astype(jnp.float32))
        return jax.lax.map(blk, jnp.arange(nb))
    out["a_addr_span_ms"] = _time_ms(stage_a); print(out, flush=True)

    # B: + the 8-row gather (touch all gathered bytes once)
    @jax.jit
    def stage_b():
        def blk(b):
            qb, local, span_start = common(b)
            span = jax.lax.dynamic_slice(
                table.data, (span_start, 0), (span_rows, cap * 4))
            rows = span[local].reshape(bq, 8 * cap * 4)
            return jnp.sum(rows, axis=1)
        return jax.lax.map(blk, jnp.arange(nb))
    out["b_plus_gather_ms"] = _time_ms(stage_b); print(out, flush=True)

    # C: + packed distance matmul (no argmin)
    @jax.jit
    def stage_c():
        def blk(b):
            qb, local, span_start = common(b)
            span = jax.lax.dynamic_slice(
                table.data, (span_start, 0), (span_rows, cap * 4))
            d2, rows = cell_list._span_sqdist(
                span, local, qb, jnp.ones((bq, 8), bool))
            return jnp.min(d2, axis=1)
        return jax.lax.map(blk, jnp.arange(nb))
    out["c_plus_distance_ms"] = _time_ms(stage_c); print(out, flush=True)

    # D: full current production path
    out["d_full_ms"] = _time_ms(lambda: cell_list.nn1_radius_blocked(
        table, qs, r, block_queries=bq, span_rows=span_rows)[1])

    # E: gather WITHOUT span indirection (operand = full 210 MB table)
    @jax.jit
    def stage_e():
        def blk(b):
            qb, local, span_start = common(b)
            ids = local + span_start
            rows = table.data[ids].reshape(bq, 8 * cap * 4)
            return jnp.sum(rows, axis=1)
        return jax.lax.map(blk, jnp.arange(nb))
    out["e_gather_full_table_ms"] = _time_ms(stage_e); print(out, flush=True)

    # F: pair-view gather — 4 double-rows per query instead of 8 rows.
    # even/odd z-pair views concatenated; idx = (b>>1) + (b&1)*half
    C4 = cap * 4
    half = (R + 1) // 2
    even = table.data[: 2 * half].reshape(half, 2 * C4)
    odd = jnp.concatenate([table.data[1:], table.data[:1]]).reshape(-1)[
        : 2 * half * C4].reshape(half, 2 * C4)
    pair_view = jnp.concatenate([even, odd])        # [2*half, 2*C4]
    jax.block_until_ready(pair_view)
    z_strides = jnp.asarray([(i * cy + j) * cz for i in (0, 1)
                             for j in (0, 1)], jnp.int32)

    @jax.jit
    def stage_f(pv):
        def blk(b):
            qb, local, span_start = common(b)
            base = jnp.floor((qb - r - table.origin) / table.cell_size
                             ).astype(jnp.int32)
            bid = (base[:, 0] * cy + base[:, 1]) * cz + base[:, 2]
            ids4 = jnp.clip(bid[:, None] + z_strides[None, :], 0, R - 1)
            pidx = (ids4 >> 1) + (ids4 & 1) * half
            rows = pv[pidx].reshape(bq, 8 * C4)
            return jnp.sum(rows, axis=1)
        return jax.lax.map(blk, jnp.arange(nb))
    out["f_pair_gather_full_ms"] = _time_ms(lambda: stage_f(pair_view))

    print(json.dumps(out, indent=1))
    with open("/root/repo/PROFILE_SWEEP.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
