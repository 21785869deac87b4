"""Head-to-head sweep variants at 1M (repeat-free masking + matmul-folded
truncation) to pick the production kernel. Writes PROFILE_SWEEP2.json."""

import json
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import jax.numpy as jnp
import numpy as np

from pcl_tpu.core.transforms import transform_points
from pcl_tpu.registration import estimation
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
    C4 = cap * 4
    S = 8 * cap
    L = 8 * C4
    nb_blocks = max(1, -(-2 * (R + 1) // span_rows))
    bq = max(8192, -(-n // nb_blocks))
    Q = qs.shape[0]
    nb = -(-Q // bq)
    Qpad = nb * bq
    qp = jnp.concatenate([qs, jnp.full((Qpad - Q, 3), 1e30, jnp.float32)])
    cx, cy, cz = dims
    strides_np = [(i * cy + j) * cz + k for i in (0, 1) for j in (0, 1)
                  for k in (0, 1)]
    strides = jnp.asarray(strides_np, jnp.int32)
    out = {}

    lane = jnp.arange(L, dtype=jnp.int32)
    is_coord_l = (lane % 4 < 3)
    is_idx_l = (lane % 4) == 3
    # distance group-sum matrix [L, S]
    Gd = ((lane[:, None] // 4 == jnp.arange(S, dtype=jnp.int32)[None, :])
          & is_coord_l[:, None]).astype(jnp.float32)
    # trunc matrix: idx lane of offset o -> column o  [L, 8]
    Gt = ((lane[:, None] // C4 == jnp.arange(8, dtype=jnp.int32)[None, :])
          & is_idx_l[:, None]).astype(jnp.float32)
    # penalty matrix [8, S]: offset o -> its cap columns
    Gp = (jnp.arange(S, dtype=jnp.int32)[None, :] // cap
          == jnp.arange(8, dtype=jnp.int32)[:, None]).astype(jnp.float32)
    r2 = jnp.float32(r) ** 2

    def common(b):
        qb = jax.lax.dynamic_slice(qp, (b * bq, 0), (bq, 3))
        base = jnp.floor((qb - r - table.origin) / table.cell_size).astype(jnp.int32)
        ok0 = (base >= 0) & (base < jnp.asarray([cx, cy, cz]))
        ok1 = (base + 1 >= 0) & (base + 1 < jnp.asarray([cx, cy, cz]))
        oks = []
        for i in (0, 1):
            for j in (0, 1):
                for k in (0, 1):
                    sel = jnp.stack([ok1[:, 0] if i else ok0[:, 0],
                                     ok1[:, 1] if j else ok0[:, 1],
                                     ok1[:, 2] if k else ok0[:, 2]], axis=1)
                    oks.append(jnp.all(sel, axis=1))
        bucket_ok = jnp.stack(oks, axis=1)
        bid = (base[:, 0] * cy + base[:, 1]) * cz + base[:, 2]
        ids = bid[:, None] + strides[None, :]
        realq = qb[:, 0] < 1e29
        idmin = jnp.min(jnp.where(bucket_ok & realq[:, None], ids, R))
        span_start = jnp.clip(idmin, 0, max(R + 1 - span_rows, 0))
        local = ids - span_start
        in_span = (local >= 0) & (local < span_rows)
        miss = bucket_ok & ~in_span & realq[:, None]
        ok = bucket_ok & in_span
        span = jax.lax.dynamic_slice(
            table.data, (span_start, 0), (span_rows, C4))
        rows = span[jnp.clip(local, 0, span_rows - 1)].reshape(bq, L)
        return qb, rows, ok, miss

    # V2: repeat-free: penalty folded into the matmul; trunc via neg matmul
    @jax.jit
    def v2():
        def blk(b):
            qb, rows, ok, miss = common(b)
            q4 = jnp.concatenate([qb, jnp.zeros_like(qb[:, :1])], axis=1)
            diff = jnp.clip((rows - jnp.tile(q4, (1, S))) *
                            is_coord_l.astype(jnp.float32)[None, :], -1e15, 1e15)
            pen = jnp.where(ok, 0.0, 1.0)                    # [B,8]
            d2 = (jnp.dot(diff * diff, Gd, preferred_element_type=jnp.float32)
                  + jnp.dot(pen, Gp * 1e30,
                            preferred_element_type=jnp.float32))
            d2 = jnp.where(d2 <= r2, d2, jnp.inf)
            neg = jnp.minimum(rows, 0.0) * Gt.max(axis=1)    # zero non-idx lanes
            t = jnp.dot(neg, Gt, preferred_element_type=jnp.float32)  # [B,8]
            trunc = jnp.any(ok & (t < 0.0), axis=1) | jnp.any(miss, axis=1)
            best = jnp.argmin(d2, axis=-1)
            best_d2 = jnp.take_along_axis(d2, best[:, None], axis=-1)[:, 0]
            lane4 = best[:, None] * 4 + jnp.arange(4, dtype=best.dtype)[None, :]
            win = jnp.take_along_axis(rows, lane4, axis=1)
            idx = jnp.where(win[:, 3] < 0, -win[:, 3] - 1.0,
                            win[:, 3]).astype(jnp.int32)
            return idx, best_d2, trunc, win[:, :3]
        return jax.lax.map(blk, jnp.arange(nb))
    out["v2_penalty_matmul_ms"] = _time_ms(v2)
    print(out, flush=True)

    # V3: as V2 but no trunc at all (lower bound on bookkeeping)
    @jax.jit
    def v3():
        def blk(b):
            qb, rows, ok, miss = common(b)
            q4 = jnp.concatenate([qb, jnp.zeros_like(qb[:, :1])], axis=1)
            diff = jnp.clip((rows - jnp.tile(q4, (1, S))) *
                            is_coord_l.astype(jnp.float32)[None, :], -1e15, 1e15)
            pen = jnp.where(ok, 0.0, 1.0)
            d2 = (jnp.dot(diff * diff, Gd, preferred_element_type=jnp.float32)
                  + jnp.dot(pen, Gp * 1e30,
                            preferred_element_type=jnp.float32))
            d2 = jnp.where(d2 <= r2, d2, jnp.inf)
            best = jnp.argmin(d2, axis=-1)
            best_d2 = jnp.take_along_axis(d2, best[:, None], axis=-1)[:, 0]
            lane4 = best[:, None] * 4 + jnp.arange(4, dtype=best.dtype)[None, :]
            win = jnp.take_along_axis(rows, lane4, axis=1)
            idx = jnp.where(win[:, 3] < 0, -win[:, 3] - 1.0,
                            win[:, 3]).astype(jnp.int32)
            return idx, best_d2, win[:, :3]
        return jax.lax.map(blk, jnp.arange(nb))
    out["v3_no_trunc_ms"] = _time_ms(v3)
    print(out, flush=True)

    # V5: estimation from sweep outputs (no tgt gather): the new icp
    # estimation side
    idx, d2v, trunc, dst = v2()
    idx = idx.reshape(-1)[:Q]
    d2v = d2v.reshape(-1)[:Q]
    dst = dst.reshape(-1, 3)[:Q]
    jax.block_until_ready(dst)

    @jax.jit
    def est(T):
        src_t = transform_points(T, qs)
        w = jnp.isfinite(d2v).astype(jnp.float32)
        d = jnp.where(jnp.isfinite(d2v)[:, None], dst, 0.0)
        return estimation.estimate_svd(src_t, d, w)
    out["estimate_nogather_ms"] = _time_ms(lambda: est(jnp.eye(4)))
    print(out, flush=True)

    with open("/root/repo/PROFILE_SWEEP2.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
