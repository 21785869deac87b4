"""Per-stage profile of the 1M-point ICP iteration on the real TPU
(VERDICT r2 'next #1': commit a per-stage breakdown + roofline).

Times each stage of the headline configuration separately:
  - cell-table build (amortized, outside the loop)
  - source argsort by dense id (amortized)
  - the blocked windowed-span NN sweep (the reported hot stage)
  - transform + SVD estimation at 1M points
  - the full fused icp() iteration for reference
plus sweep variants (span size, block size, cap) to locate the knee.

Writes PROFILE_1M.json. Run: python profile_1m.py [n]
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

from pcl_tpu.core.cloud import Cloud
from pcl_tpu.core.transforms import transform_points
from pcl_tpu.registration import estimation
from pcl_tpu.registration.icp import icp, build_index
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
    return min(ts) * 1e3


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

    # --- build ---
    cell = jnp.float32(2.0 * max_corr_dist)
    out["build_ms"] = _time_ms(lambda: cell_list.build(
        tgt_j, mask, cell, cap=cap, dims=dims).data)
    table = cell_list.build(tgt_j, mask, cell, cap=cap, dims=dims)
    jax.block_until_ready(table.data)
    out["table_mb"] = round(table.data.size * 4 / 1e6, 1)

    # --- source sort by dense id (amortized once per align) ---
    def sort_src():
        skey = cell_list._dense_id(cell_list._query_coords(table, src_j), dims)
        return src_j[jnp.argsort(skey)]
    out["argsort_ms"] = _time_ms(sort_src)
    src_sorted = sort_src()
    jax.block_until_ready(src_sorted)

    # --- the blocked sweep, current production parameters ---
    span0 = 131072
    n_blocks = max(1, -(-2 * (table.table_size + 1) // span0))
    bq0 = max(8192, -(-n // n_blocks))
    out["sweep_ms_prod"] = _time_ms(lambda: cell_list.nn1_radius_blocked(
        table, src_sorted, max_corr_dist,
        block_queries=bq0, span_rows=span0)[1])
    out["sweep_prod_cfg"] = {"block_queries": bq0, "span_rows": span0}

    # --- sweep parameter sensitivity ---
    for bq, span in ((32768, 65536), (65536, 65536), (65536, 131072),
                     (131072, 131072), (131072, 262144), (262144, 262144)):
        key = f"sweep_ms_bq{bq//1024}k_span{span//1024}k"
        try:
            out[key] = _time_ms(lambda bq=bq, span=span:
                                cell_list.nn1_radius_blocked(
                                    table, src_sorted, max_corr_dist,
                                    block_queries=bq, span_rows=span)[1])
        except Exception as e:  # noqa: BLE001
            out[key] = repr(e)

    # --- plain (unblocked) gather path for comparison ---
    out["sweep_ms_unblocked"] = _time_ms(lambda: cell_list.nn1_radius(
        table, src_sorted, max_corr_dist, compact=True)[1])

    # --- estimation side: transform + correspondence-free SVD reduction ---
    idx, d2, _ = cell_list.nn1_radius_blocked(
        table, src_sorted, max_corr_dist, block_queries=bq0, span_rows=span0)
    jax.block_until_ready(idx)

    @jax.jit
    def estimate(T):
        src_t = transform_points(T, src_sorted)
        w = jnp.isfinite(d2).astype(jnp.float32)
        dst = tgt_j[jnp.clip(idx, 0, n - 1)]
        return estimation.estimate_svd(src_t, dst, w)

    out["transform_estimate_ms"] = _time_ms(lambda: estimate(jnp.eye(4)))

    # --- full production iteration for cross-check ---
    src_c = Cloud(xyz=src_j, mask=mask)
    tgt_c = Cloud(xyz=tgt_j, mask=mask)
    tbl2 = build_index(tgt_c, max_corr_dist, cell_cap=cap, grid_dims=dims)
    jax.block_until_ready(tbl2.data)
    ITERS = 20

    def run():
        return icp(src_c, tgt_c, max_corr_dist=max_corr_dist,
                   max_iterations=ITERS, transformation_eps=0.0,
                   abs_mse_eps=0.0, rel_mse_eps=0.0,
                   cell_cap=cap, grid_dims=dims, index=tbl2).transform
    total = _time_ms(run, reps=3)
    out["full_icp_ms_per_iter"] = round(total / ITERS, 2)

    out = {k: (round(v, 2) if isinstance(v, float) else v) for k, v in out.items()}
    with open("/root/repo/PROFILE_1M.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
