"""Headline benchmark: ICP iterations/sec on a KITTI-scale (120k pt) pair.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} — the
headline metric. Additional metrics (1M-point ICP — the BASELINE.json
configuration, kNN queries/sec/chip, GICP iters/sec, per-stage timings) are
written to BENCH_EXTRA.json and printed to stderr.

Baseline: 5.92 iters/sec CPU kd-tree proxy (see BASELINE.md).
Set PCL_TPU_PROFILE=<dir> to capture a jax.profiler trace of the headline
run (SURVEY §5 observability obligation).
"""

import json
import os
import sys
import time

import numpy as np

# persistent XLA compilation cache: graphs compile via the remote-compile
# service (minutes); cache hits make reruns instant. The driver image's
# sitecustomize imports jax before this module runs, so env vars are too
# late — use config updates.
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import jax.numpy as jnp  # noqa: E402

CPU_BASELINE_ITERS_PER_SEC = 5.92
ITERS = 20


def _pair(n, scale=0.05, seed=0):
    rng = np.random.default_rng(seed)
    tgt = rng.uniform(-50, 50, size=(n, 3)).astype(np.float32)
    src = tgt + rng.normal(scale=scale, size=(n, 3)).astype(np.float32)
    return src, tgt


def _cloud(x):
    from pcl_tpu.core.cloud import Cloud
    return Cloud(xyz=jnp.asarray(x), mask=jnp.ones((x.shape[0],), bool))


def _time_best(fn, reps=3):
    """Best-of-reps wall time. ``fn`` may take a rep index ``k`` — USE IT
    to perturb the inputs per call: the driver tunnel memoizes identical
    dispatches (same executable + same buffers), and an unperturbed
    repeat can time the cache instead of the device (an NDT rep once
    read 3,000,000 iters/s)."""
    import inspect
    takes_k = len(inspect.signature(fn).parameters) >= 1
    call = (lambda k: fn(k)) if takes_k else (lambda k: fn())
    call(0)  # compile + warmup
    ts = []
    for k in range(reps):
        t0 = time.perf_counter()
        out = call(k + 1)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return min(ts)


def bench_icp(n, max_corr_dist, cell_cap, grid_dims):
    from pcl_tpu.registration.icp import icp, build_index

    src, tgt = _pair(n)
    src_c, tgt_c = _cloud(src), _cloud(tgt)
    # prebuild the target index outside the timed loop — the setInputTarget
    # amortization; the CPU baseline likewise excludes its kd-tree build
    # (BASELINE.md: 0.052 s build not counted in the 0.169 s/iter figure)
    table = build_index(tgt_c, max_corr_dist, cell_cap=cell_cap,
                        grid_dims=grid_dims)
    jax.block_until_ready(table.data)

    def run(k=0):
        from pcl_tpu.core.cloud import Cloud
        # per-call nm-scale perturbation defeats dispatch memoization
        s = Cloud(xyz=src_c.xyz + jnp.float32(k) * 1e-6, mask=src_c.mask)
        # eps=0 disables early convergence so exactly ITERS iterations run
        return icp(
            s, tgt_c,
            max_corr_dist=max_corr_dist,
            max_iterations=ITERS,
            transformation_eps=0.0,
            abs_mse_eps=0.0,
            rel_mse_eps=0.0,
            cell_cap=cell_cap,
            grid_dims=grid_dims,
            index=table,
        )

    res = run()
    jax.block_until_ready(res.transform)
    assert int(res.iterations) == ITERS
    # correctness guard: a truncated run silently returns non-nearest
    # correspondences (VERDICT r1 weak #3) — the bench must not count one
    assert not bool(res.truncated), (
        f"cell-list truncation at n={n}, cap={cell_cap}: raise cell_cap")
    best = _time_best(run)
    return ITERS / best


def bench_knn(n, k=16):
    """kNN queries/sec/chip via the cell-list 27-neighborhood search."""
    from pcl_tpu.search import cell_list

    src, tgt = _pair(n)
    tgt_j, src_j = jnp.asarray(tgt), jnp.asarray(src)
    mask = jnp.ones((n,), bool)
    # cell sized so ~k neighbors live within the 27-cell neighborhood
    vol = 100.0 ** 3
    r = float(np.cbrt(3.0 * 2 * k * vol / (4 * np.pi * n)))
    table = cell_list.build(tgt_j, mask, jnp.float32(r), table_size=1 << 17, cap=16)
    jax.block_until_ready(table.data)

    # in-jit scan with per-iteration perturbation (bench_micro._time_ms
    # methodology): a single dispatch pays the tunnel's ~25 ms sync
    # latency on a ~48 ms op, understating throughput by ~1.5x
    K = 8

    @jax.jit
    def run():
        def step(c, i):
            q = src_j + c + i.astype(jnp.float32) * 1e-6
            out = cell_list.knn_radius(table, q, k)[0]
            return c + out[0, 0].astype(jnp.float32) * 0.0, ()
        c, _ = jax.lax.scan(step, jnp.float32(0.0),
                            jnp.arange(K, dtype=jnp.int32))
        return c

    jax.block_until_ready(run())
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(run())
        ts.append((time.perf_counter() - t0) / K)
    return n / min(ts)


def bench_ndt(n):
    """NDT iterations/sec (BASELINE.json config 3 names NDT alongside
    GICP/p2plane; reference hot path registration/impl/ndt.hpp:111-170).
    resolution sized for lambda ~7 points/voxel at this density. The
    source starts 0.5 m off with a ~1.1 deg yaw so the Newton loop runs a
    realistic iteration count (the r4 analytic-derivative loop converges
    the noise-only pair in ~7 iterations, under-amortizing the one-time
    grid build + dispatch latency in an iters/sec metric)."""
    from pcl_tpu.registration.ndt import ndt
    from scipy.spatial.transform import Rotation

    src, tgt = _pair(n)
    Rz = Rotation.from_euler("z", 0.02).as_matrix().astype(np.float32)
    src = src @ Rz.T + np.asarray([0.4, 0.2, -0.15], np.float32)

    src_j = jnp.asarray(src)
    tgt_c = _cloud(tgt)

    def run(iters, k=0):
        # per-call perturbation: the driver tunnel MEMOIZES identical
        # dispatches (same executable + same buffers), so repeat timing of
        # an unperturbed call measures the cache, not the device
        from pcl_tpu.core.cloud import Cloud
        s = Cloud(xyz=src_j + jnp.float32(k) * 1e-6,
                  mask=jnp.ones((n,), bool))
        return ndt(s, tgt_c, resolution=4.0,
                   max_iterations=iters, transformation_eps=0.0,
                   step_size=0.5)

    # correctness: from 0.5 m + 1.1 deg off, the align must recover the
    # inverse offset (coarse 4 m voxels -> decimeter-level bound)
    res = run(ITERS)
    jax.block_until_ready(res.transform)
    T = np.asarray(res.transform)
    assert abs(np.degrees(np.arctan2(T[1, 0], T[0, 0])) + 1.146) < 0.3, T
    # MARGINAL per-iteration cost: the analytic-Newton loop converges this
    # pair in ~6 iterations, so amortized iters/sec would mostly measure
    # the one-time grid build + dispatch latency; difference of two
    # iteration budgets isolates the hot loop (both below convergence)
    jax.block_until_ready(run(2).transform)   # compile the 2-iter variant

    def marginal():
        ws = []
        for it in (2, 5):
            ts = []
            for k in range(3):
                t0 = time.perf_counter()
                jax.block_until_ready(run(it, k).transform)
                ts.append(time.perf_counter() - t0)
            ws.append(min(ts))
        return ws[1] - ws[0]

    deltas = [marginal() for _ in range(2)]
    return 3.0 / max(min(deltas), 1e-3)


def bench_gicp(n):
    from pcl_tpu.registration.gicp import gicp

    src, tgt = _pair(n)
    src_j = jnp.asarray(src)

    def run(k=0):
        # per-call perturbation defeats dispatch memoization (_time_best)
        # cap 8 at lambda~0.96/cell (see bench_icp note); correspondence
        # grid dense like the ICP entry so hash birthday-merging cannot
        # inflate overflow. Covariance neighborhoods use the hashed table
        # (density radius is data-dependent): birthday merging there
        # inflates bucket populations, so the cap carries extra headroom.
        # covariance neighborhoods on a DENSE 4.5 m grid (the density
        # radius for k=20 at this density is ~4.3): collision-free, so
        # cap 32 suffices where the hashed table needed 64 (and the
        # [Q, 27*cap] distance work is 4x smaller)
        from pcl_tpu.core.cloud import Cloud
        s = Cloud(xyz=src_j + jnp.float32(k) * 1e-6,
                  mask=jnp.ones((src_j.shape[0],), bool))
        return gicp(s, _cloud(tgt), max_corr_dist=1.0,
                    max_iterations=ITERS, transformation_eps=0.0,
                    cell_cap=8, corr_backend="cell", grid_dims=(53, 53, 53),
                    cov_cell_size=4.5, cov_grid_dims=(24, 24, 24),
                    cov_cell_cap=32)

    res = run()
    jax.block_until_ready(res.transform)
    # correctness guard (VERDICT r2 weak #3): a truncated run degrades
    # covariances/correspondences silently — the bench must not count one
    assert not bool(res.truncated), "GICP bench truncated: raise cell_cap"
    iters = int(res.iterations)
    best = _time_best(run)
    return iters / best


def bench_gicp_500k():
    """GICP at 500k (VERDICT r3 #3's >=500k precision-aligner point).
    Same density-scaled sizing as the 120k entry: corr cells keep
    lambda~1 (dims ~ 53 * cbrt(500/120) = 85), covariance grid keeps the
    k=20 density radius (~2.7 m at this density)."""
    from pcl_tpu.registration.gicp import gicp

    n = 500_000
    src, tgt = _pair(n)
    src_j = jnp.asarray(src)

    def run(k=0):
        # per-call perturbation defeats dispatch memoization (_time_best)
        # corr cells stay 2.0 m (cell = 2*max_corr), so lambda scales with
        # n: ~4 points/cell at 500k -> cap 20 (P[X>20|4] ~ 1e-9 per cell);
        # covariance grid lambda ~10.7 -> cap 40
        from pcl_tpu.core.cloud import Cloud
        s = Cloud(xyz=src_j + jnp.float32(k) * 1e-6,
                  mask=jnp.ones((src_j.shape[0],), bool))
        return gicp(s, _cloud(tgt), max_corr_dist=1.0,
                    max_iterations=ITERS, transformation_eps=0.0,
                    cell_cap=20, corr_backend="cell", grid_dims=(53, 53, 53),
                    cov_cell_size=2.8, cov_grid_dims=(37, 37, 37),
                    cov_cell_cap=40)

    res = run()
    jax.block_until_ready(res.transform)
    assert not bool(res.truncated), "GICP 500k bench truncated: raise caps"
    iters = int(res.iterations)
    best = _time_best(run)
    return iters / best


def bench_ate(n=20000, n_scans=5):
    """North-star metric #2: trajectory ATE through sequence odometry
    (synthetic drift fixture — deterministic, catches accuracy regressions
    in any registration component; see tests/test_trajectory.py for the
    real-scan variants)."""
    from pcl_tpu.core.cloud import Cloud
    from pcl_tpu.registration.trajectory import (
        make_drift_sequence, odometry_sequence, trajectory_ate)

    rng = np.random.default_rng(7)
    # three non-parallel sheets + blob: full 6-DoF constraint
    # (tests/test_trajectory.py's _scene)
    third = n // 3
    a = rng.uniform(-1, 1, size=(third, 2)).astype(np.float32)
    p1 = np.c_[a[:, 0], a[:, 1], 0.05 * np.sin(3 * a[:, 0])]
    p2 = np.c_[a[:, 0], -1 + 0.05 * np.sin(3 * a[:, 1]), a[:, 1]]
    p3 = np.c_[1 + 0.05 * np.cos(3 * a[:, 1]), a[:, 0], a[:, 1]]
    blob = rng.normal(scale=0.2, size=(n - 3 * third, 3)) + [0.3, 0.3, 0.5]
    scene = np.concatenate([p1, p2, p3, blob]).astype(np.float32)
    # 2 mm sensor noise so the tracked number is the odometry's real
    # noise floor, not an exact-fixture zero
    scans, golden = make_drift_sequence(scene, n_scans, rng,
                                        step_translation=0.03,
                                        step_rotation=0.03,
                                        noise=0.002)
    clouds = [Cloud(xyz=jnp.asarray(s), mask=jnp.ones(len(s), bool))
              for s in scans]
    # brute correspondences: at 20k points the MXU brute sweep is both
    # faster and exact; the scene is far too dense for r-sized buckets
    poses = odometry_sequence(clouds, max_corr_dist=0.25, max_iterations=40,
                              corr_backend="bruteforce")
    return trajectory_ate(poses, golden, align=False).rmse


def bench_ate_real():
    """REAL-scan ATE headline (VERDICT r3 #4): (1) incremental GICP over
    the reference's bun01-03 multi-scan fixtures against their shipped
    layout, and (2) a longer virtual-scanner trajectory through the real
    office1.pcd scene (partial frustum-cropped overlapping views, ground
    truth poses — the reference's tools/virtual_scanner.cpp flow). Returns
    (ate_office_rmse, ate_bun_rmse)."""
    from pcl_tpu.core.cloud import Cloud
    from pcl_tpu.io import pcd as pcd_io
    from pcl_tpu.registration.gicp import gicp
    from pcl_tpu.registration.trajectory import (
        make_virtual_scan_sequence, odometry_sequence, trajectory_ate)

    ref = "/root/reference/test"

    def pad_cloud(xyz, cap):
        m = np.zeros((cap,), bool)
        m[: len(xyz)] = True
        p = np.zeros((cap, 3), np.float32)
        p[: len(xyz)] = xyz
        return Cloud(xyz=jnp.asarray(p), mask=jnp.asarray(m))

    # (1) bun01-03 against the shipped (pre-aligned) layout
    scans = []
    for name in ("bun01.pcd", "bun02.pcd", "bun03.pcd"):
        c = pcd_io.load(os.path.join(ref, name))
        scans.append(np.asarray(c.xyz)[np.asarray(c.mask)])
    cap = max(len(s) for s in scans)
    clouds = [pad_cloud(s, cap) for s in scans]
    poses = odometry_sequence(
        clouds, register=lambda s, t: gicp(s, t, max_corr_dist=0.04,
                                           max_iterations=40))
    bun_rmse = trajectory_ate(
        poses, np.stack([np.eye(4)] * 3), align=False).rmse

    # (2) office1 virtual-scanner trajectory, 8 partial views
    c = pcd_io.load(os.path.join(ref, "office1.pcd"))
    scene = np.asarray(c.xyz)[np.asarray(c.mask)]
    rng = np.random.default_rng(11)
    vscans, golden = make_virtual_scan_sequence(
        scene, n_scans=8, rng=rng, step_translation=0.05,
        step_rotation=0.02, max_points=60000, noise=0.002)
    vclouds = [pad_cloud(s, 60000) for s in vscans]
    vposes = odometry_sequence(
        vclouds, register=lambda s, t: gicp(s, t, max_corr_dist=0.25,
                                            max_iterations=40))
    office_rmse = trajectory_ate(vposes, golden, align=True).rmse
    return office_rmse, bun_rmse


def main():
    extra = {}
    profile_dir = os.environ.get("PCL_TPU_PROFILE")

    # headline: 120k ICP. max_corr_dist=1.0 ~ 2.3x expected NN distance at
    # this density; cell=2r gives Poisson lambda~0.96 points/cell, so cap=4
    # TRUNCATES (P[X>4]~0.003 x 125k cells — round 1 ran exactly that
    # silently); cap=8 brings the overflow expectation to ~1e-2 cells and
    # the run ASSERTS non-truncation. The DENSE grid (53^3 cells over the
    # [-50,50]^3 + noise bbox) is collision-free — a hash table merges
    # distinct cells birthday-style and truncates even at cap=8.
    if profile_dir:
        with jax.profiler.trace(profile_dir):
            v120 = bench_icp(120_000, 1.0, 8, (53, 53, 53))
    else:
        v120 = bench_icp(120_000, 1.0, 8, (53, 53, 53))
    extra["icp_iters_per_sec_120k"] = round(v120, 2)

    # the BASELINE.json configuration: 1M-point cloud (denser: NN ~ 0.06;
    # gate 0.5 -> cell 1.0 -> lambda ~1 point/cell; cap 12 puts the overflow
    # expectation below 1e-2 across the dense 103^3 grid)
    try:
        extra["icp_iters_per_sec_1m"] = round(
            bench_icp(1_000_000, 0.5, 12, (103, 103, 103)), 2)
    except Exception as e:  # noqa: BLE001
        extra["icp_iters_per_sec_1m_error"] = repr(e)

    try:
        extra["knn16_queries_per_sec_120k"] = round(bench_knn(120_000), 0)
    except Exception as e:  # noqa: BLE001
        extra["knn_error"] = repr(e)

    try:
        extra["gicp_iters_per_sec_120k"] = round(bench_gicp(120_000), 2)
    except Exception as e:  # noqa: BLE001
        extra["gicp_error"] = repr(e)

    # >=500k-scale precision-aligner point (VERDICT r3 #3): same density
    # scaling as the 120k entry (cell counts follow cbrt(n) ratios)
    try:
        extra["gicp_iters_per_sec_500k"] = round(bench_gicp_500k(), 2)
    except Exception as e:  # noqa: BLE001
        extra["gicp_500k_error"] = repr(e)

    try:
        extra["ndt_iters_per_sec_120k"] = round(bench_ndt(120_000), 2)
    except Exception as e:  # noqa: BLE001
        extra["ndt_error"] = repr(e)

    # headline ATE from REAL scans (VERDICT r3 #4); the synthetic drift
    # fixture stays as a secondary regression canary
    try:
        office_rmse, bun_rmse = bench_ate_real()
        extra["ate_rmse_m"] = round(office_rmse, 6)
        extra["ate_bun_rmse_m"] = round(bun_rmse, 6)
    except Exception as e:  # noqa: BLE001
        extra["ate_real_error"] = repr(e)

    try:
        extra["ate_drift_rmse_m"] = round(bench_ate(), 6)
    except Exception as e:  # noqa: BLE001
        extra["ate_error"] = repr(e)

    extra["vs_baseline_120k"] = round(v120 / CPU_BASELINE_ITERS_PER_SEC, 2)
    # the BASELINE.json headline config: 1M points, CPU baseline measured
    # with bench_cpu_baseline.py (same kd-tree methodology at n=1M)
    try:
        with open(os.path.join(os.path.dirname(__file__),
                               "BASELINE_CPU.json")) as f:
            cpu = json.load(f)
        if "icp_iters_per_sec_1m" in cpu and "icp_iters_per_sec_1m" in extra:
            extra["vs_baseline_1m"] = round(
                extra["icp_iters_per_sec_1m"] / cpu["icp_iters_per_sec_1m"], 2)
        if "knn16_queries_per_sec_120k" in cpu \
                and "knn16_queries_per_sec_120k" in extra:
            extra["vs_baseline_knn16"] = round(
                extra["knn16_queries_per_sec_120k"]
                / cpu["knn16_queries_per_sec_120k"], 2)
        for key, short in (("gicp_iters_per_sec_120k", "gicp"),
                           ("ndt_iters_per_sec_120k", "ndt"),
                           ("gicp_iters_per_sec_500k", "gicp_500k")):
            if key in cpu and key in extra and cpu[key] > 0:
                extra[f"vs_baseline_{short}"] = round(
                    extra[key] / cpu[key], 2)
    except Exception:  # noqa: BLE001
        pass
    with open(os.path.join(os.path.dirname(__file__), "BENCH_EXTRA.json"), "w") as f:
        json.dump(extra, f, indent=1)
    print(json.dumps(extra), file=sys.stderr)

    print(json.dumps({
        "metric": "icp_iters_per_sec_120k",
        "value": round(v120, 2),
        "unit": "iters/s",
        "vs_baseline": round(v120 / CPU_BASELINE_ITERS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
