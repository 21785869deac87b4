"""Headline benchmark: ICP iterations/sec on a KITTI-scale (120k pt) pair.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: 5.92 iters/sec CPU kd-tree proxy (see BASELINE.md).
"""

import json
import os
import time

import numpy as np

# persistent XLA compilation cache: the ICP while_loop graph takes minutes
# to compile via the remote-compile service; cache hits make reruns instant.
# The driver image's sitecustomize imports jax before this module runs, so
# env vars are too late — use config updates.
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

CPU_BASELINE_ITERS_PER_SEC = 5.92
N = 120_000
ITERS = 20


def main():
    import jax
    import jax.numpy as jnp
    from pcl_tpu.core.cloud import Cloud
    from pcl_tpu.registration.icp import icp

    rng = np.random.default_rng(0)
    tgt = rng.uniform(-50, 50, size=(N, 3)).astype(np.float32)
    src = tgt + rng.normal(scale=0.05, size=(N, 3)).astype(np.float32)

    src_c = Cloud(xyz=jnp.asarray(src), mask=jnp.ones((N,), bool))
    tgt_c = Cloud(xyz=jnp.asarray(tgt), mask=jnp.ones((N,), bool))

    def run():
        # eps=0 disables early convergence so exactly ITERS iterations run.
        # max_corr_dist=1.0 ~ 2.3x the expected NN distance (0.43 at this
        # density): >99.9% of points match, results track the full-NN sweep,
        # and the cell-list backend serves correspondences with ~1 point per
        # cell (cap 8 gives overflow probability ~1e-6 at this density).
        return icp(
            src_c, tgt_c,
            max_corr_dist=1.0,
            max_iterations=ITERS,
            transformation_eps=0.0,
            abs_mse_eps=0.0,
            rel_mse_eps=0.0,
            cell_cap=4,
        )

    # compile + warmup
    res = run()
    jax.block_until_ready(res.transform)
    assert int(res.iterations) == ITERS

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        res = run()
        jax.block_until_ready(res.transform)
        times.append(time.perf_counter() - t0)
    best = min(times)
    iters_per_sec = ITERS / best

    print(json.dumps({
        "metric": f"icp_iters_per_sec_{N//1000}k",
        "value": round(iters_per_sec, 2),
        "unit": "iters/s",
        "vs_baseline": round(iters_per_sec / CPU_BASELINE_ITERS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
