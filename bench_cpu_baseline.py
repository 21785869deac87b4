"""CPU reference-proxy baselines (run on the driver machine, single process).

Produces the reference-side numbers that bench.py / bench_micro.py report
ratios against (VERDICT r2 missing #2/#3):

- the 1M-point ICP iteration (BASELINE.json's actual headline config),
  measured with BASELINE.md's own methodology: scipy cKDTree (FLANN-class
  kd-tree, same as PCL's backend) 1-NN query + closed-form SVD estimation,
  single-threaded like pcl::IterativeClosestPoint's loop
  (reference registration/impl/icp.hpp:164-239);
- CPU proxies for each microbench in the reference's google-benchmark suite
  (reference benchmarks/CMakeLists.txt:1-24), same fixture clouds and
  parameters, implemented with scipy/numpy's C kernels — the same work the
  reference's single-threaded CPU path performs per op:
    voxel grid 0.01              (benchmarks/filters/voxel_grid.cpp:9-46)
    radius outlier removal .02/14 (benchmarks/filters/radius_outlier_removal.cpp)
    normal estimation k=16       (benchmarks/features/normal_3d.cpp)
    SHOT r=0.05                  (benchmarks/features/shot.cpp)
    radius search r=0.05         (benchmarks/search/radius_search.cpp)
    SAC cylinder 1024 hypotheses (benchmarks/sample_consensus/sac_model_cylinder.cpp)

Writes BASELINE_CPU.json. Usage: python bench_cpu_baseline.py [--quick]
(--quick shrinks the 1M config to 200k for smoke-testing the script).
"""

import json
import os
import sys
import time

# host-only benchmark: never initialize the TPU client (the axon plugin
# serializes with any concurrently running TPU process)
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
from scipy.spatial import cKDTree

REF = "/root/reference/test"
TABLE = os.path.join(REF, "table_scene_mug_stereo_textured.pcd")
MILK = os.path.join(REF, "milk_cartoon_all_small_clorox.pcd")


def _load(path):
    from pcl_tpu.io import pcd as pcd_io
    h, cols = pcd_io.read_pcd_arrays(path)
    fl = {f.lower(): f for f in h.fields}
    xyz = np.concatenate([cols[fl[k]].reshape(h.points, -1)[:, :1]
                          for k in ("x", "y", "z")], axis=1).astype(np.float32)
    return xyz[np.isfinite(xyz).all(axis=1)]


def _time_ms(fn, reps=3, label=""):
    t0 = time.perf_counter()
    fn()
    warm = time.perf_counter() - t0
    # don't spend >1 min repeating an op that plainly takes many seconds
    reps = 1 if warm > 20 else reps
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    print(f"  {label}: {min(ts)*1e3:.1f} ms", file=sys.stderr, flush=True)
    return min(ts) * 1e3


def icp_iters_per_sec(n, reps=3):
    """One ICP iteration = full 1-NN query of the source into the target
    kd-tree + SVD estimation (the per-iteration work of icp.hpp:183,216;
    the tree build is amortized across iterations like initCompute)."""
    rng = np.random.default_rng(0)
    tgt = rng.uniform(-50, 50, size=(n, 3)).astype(np.float32)
    src = tgt + rng.normal(scale=0.05, size=(n, 3)).astype(np.float32)
    t0 = time.perf_counter()
    tree = cKDTree(tgt)
    build_s = time.perf_counter() - t0

    def one_iter():
        d, idx = tree.query(src, k=1)
        dst = tgt[idx]
        mu_s, mu_d = src.mean(0), dst.mean(0)
        H = (src - mu_s).T @ (dst - mu_d)
        U, _S, Vt = np.linalg.svd(H)
        D = np.diag([1.0, 1.0, np.sign(np.linalg.det(Vt.T @ U.T))])
        R = Vt.T @ D @ U.T
        return R, mu_d - R @ mu_s

    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        one_iter()
        ts.append(time.perf_counter() - t0)
    return 1.0 / min(ts), build_s


def bm_voxel_grid(xyz, leaf=0.01):
    """PCL VoxelGrid: leaf index -> sort -> segment centroid
    (voxel_grid.hpp:647-725)."""
    mn = xyz.min(0)
    ij = np.floor((xyz - mn) / leaf).astype(np.int64)
    dims = ij.max(0) + 1
    lin = (ij[:, 0] * dims[1] + ij[:, 1]) * dims[2] + ij[:, 2]
    order = np.argsort(lin)
    ls = lin[order]
    uniq, start = np.unique(ls, return_index=True)
    sums = np.add.reduceat(xyz[order], start, axis=0)
    cnt = np.diff(np.r_[start, len(ls)])
    return sums / cnt[:, None]


def bm_radius_outlier(xyz, r=0.02, min_n=14):
    tree = cKDTree(xyz)
    cnt = tree.query_ball_point(xyz, r, return_length=True, workers=1)
    return xyz[cnt - 1 >= min_n]


def bm_normals(xyz, k=16):
    tree = cKDTree(xyz)
    _d, idx = tree.query(xyz, k=k, workers=1)
    nbr = xyz[idx]                       # [N,k,3]
    mu = nbr.mean(1, keepdims=True)
    d = nbr - mu
    cov = np.einsum("nki,nkj->nij", d, d) / k
    w, v = np.linalg.eigh(cov)
    return v[:, :, 0]


def bm_shot(xyz, normals, r=0.05, cap=32):
    """SHOT-class work per point: radius neighborhood (capped), LRF from
    the weighted covariance, cosine binning of neighbor normals into the
    32-sector x 11-bin histogram (features/impl/shot.hpp structure)."""
    tree = cKDTree(xyz)
    d, idx = tree.query(xyz, k=cap, distance_upper_bound=r, workers=1)
    valid = np.isfinite(d)
    idx = np.where(valid, idx, 0)
    nbr = xyz[idx]
    d_c = np.where(valid[..., None], nbr - xyz[:, None, :], 0.0)
    wgt = np.where(valid, r - np.sqrt(np.where(valid, (d_c ** 2).sum(-1), 0)), 0)
    cov = np.einsum("nk,nki,nkj->nij", wgt, d_c, d_c)
    cov /= np.maximum(wgt.sum(1), 1e-9)[:, None, None]
    _w, v = np.linalg.eigh(cov)
    lrf_z = v[:, :, 0]
    nn = normals[idx]
    cosang = np.clip(np.einsum("nki,ni->nk", nn, lrf_z), -1, 1)
    bins = np.minimum((0.5 * (1 + cosang) * 10).astype(np.int64), 10)
    # sector from the local frame octant (8 azimuth x 2 elevation x 2 radial)
    loc = np.einsum("nki,nij->nkj", d_c, v)
    sector = ((loc[..., 0] > 0).astype(np.int64)
              + 2 * (loc[..., 1] > 0) + 4 * (loc[..., 2] > 0)
              + 8 * (np.sqrt((loc ** 2).sum(-1)) > 0.5 * r))
    hist = np.zeros((len(xyz), 16 * 11), np.float32)
    flat = sector * 11 + bins
    np.add.at(hist, (np.arange(len(xyz))[:, None], flat), valid.astype(np.float32))
    return hist


def bm_radius_search(xyz, r=0.05, cap=32):
    # capped radius search (32 nearest within r) — the same op
    # bench_micro.py's cell-list radius_search(cap_out=32) performs; the
    # uncapped list form on this 209k organized cloud averages 1266
    # neighbors/point and is memory-unbounded
    tree = cKDTree(xyz)
    d, i = tree.query(xyz, k=cap, distance_upper_bound=r, workers=1)
    return i


def bm_sac_cylinder(xyz, normals, thresh=0.02, hypotheses=1024):
    """Distance scoring of `hypotheses` cylinder models, sequential per
    hypothesis (PCL's RANSAC loop shape, vectorized per-model inner loop
    like its SSE point loop)."""
    rng = np.random.default_rng(0)
    n = len(xyz)
    best = -1
    for _ in range(hypotheses):
        i, j = rng.integers(0, n, 2)
        p, nrm = xyz[i], normals[i]
        axis = np.cross(nrm, normals[j])
        an = np.linalg.norm(axis)
        if an < 1e-9:
            continue
        axis = axis / an
        rad = 0.02
        v = xyz - p
        par = v @ axis
        radial = v - par[:, None] * axis
        dist = np.abs(np.sqrt((radial ** 2).sum(1)) - rad)
        score = int((dist < thresh).sum())
        best = max(best, score)
    return best


def _gicp_pair(n, seed=0):
    rng = np.random.default_rng(seed)
    tgt = rng.uniform(-50, 50, size=(n, 3)).astype(np.float32)
    src = tgt + rng.normal(scale=0.05, size=(n, 3)).astype(np.float32)
    return src, tgt


def gicp_iters_per_sec(n, iters=20, k=20, max_corr=1.0):
    """CPU GICP proxy (VERDICT r3 #3), same work as reference
    registration/impl/gicp.hpp:73-139 + the per-iteration loop:

    one-time: k=20-NN covariances on BOTH clouds, regularized to
    (1,1,eps) eigenvalues; per iteration: gated 1-NN correspondences,
    per-pair Mahalanobis M = (C_t + C_s)^-1 (R~I proxy), weighted 6x6
    Gauss-Newton normal equations + solve. Vectorized numpy (generous to
    the CPU: PCL's own inner loop is scalar C++ with a BFGS line search).
    Returns iterations/sec counting the covariance setup against the run
    like align() does."""
    src, tgt = _gicp_pair(n)
    t_total0 = time.perf_counter()
    cov = {}
    for name, pts in (("s", src), ("t", tgt)):
        tree = cKDTree(pts)
        _d, idx = tree.query(pts, k=k, workers=1)
        nbr = pts[idx]
        mu = nbr.mean(axis=1, keepdims=True)
        d = nbr - mu
        C = np.einsum("nki,nkj->nij", d, d) / k
        w, v = np.linalg.eigh(C)
        # reference regularization: eigenvalues -> (eps, 1, 1)
        w_reg = np.broadcast_to(np.array([1e-3, 1.0, 1.0]), w.shape)
        cov[name] = np.einsum("nij,nj,nkj->nik", v, w_reg, v)
    tree_t = cKDTree(tgt)
    cur = src.copy()
    for _ in range(iters):
        d, idx = tree_t.query(cur, k=1, distance_upper_bound=max_corr,
                              workers=1)
        ok = np.isfinite(d)
        idx = np.where(ok, idx, 0)
        M = np.linalg.inv(cov["t"][idx] + cov["s"])        # [n,3,3]
        r = tgt[idx] - cur                                  # residuals
        # J rows: [I | -[p]x] — normal equations accumulated in 6x6
        J = np.zeros((n, 3, 6), np.float32)
        J[:, :, :3] = np.eye(3)
        px, py, pz = cur[:, 0], cur[:, 1], cur[:, 2]
        J[:, 0, 4], J[:, 0, 5] = pz, -py
        J[:, 1, 3], J[:, 1, 5] = -pz, px
        J[:, 2, 3], J[:, 2, 4] = py, -px
        MJ = np.einsum("nij,njk->nik", M, J)
        w = ok.astype(np.float32)[:, None, None]
        H = np.einsum("nij,nik->jk", J * w, MJ)
        g = np.einsum("nij,ni->j", MJ * w, r)
        delta = np.linalg.solve(H + 1e-6 * np.eye(6), g)
        # apply the translation part (proxy update; cost is what matters)
        cur = cur + delta[:3][None, :].astype(np.float32)
    total = time.perf_counter() - t_total0
    return iters / total


def ndt_iters_per_sec(n, iters=20, resolution=4.0):
    """CPU NDT proxy (VERDICT r3 #3), same work as reference
    registration/impl/ndt.hpp:111-170,211: one-time VoxelGridCovariance
    target grid (mean/cov/icov per voxel), then per iteration the
    per-point Gaussian score + analytic 6-gradient + 6x6 Hessian
    accumulation, Newton solve, and one step-length re-evaluation of the
    score (More-Thuente does several; one is generous)."""
    src, tgt = _gicp_pair(n)
    t0 = time.perf_counter()
    # --- voxel Gaussian grid over the target
    coords = np.floor(tgt / resolution).astype(np.int64)
    cmin = coords.min(0)
    span = coords.max(0) - cmin + 1
    lin = ((coords[:, 2] - cmin[2]) * span[1] + (coords[:, 1] - cmin[1])) \
        * span[0] + (coords[:, 0] - cmin[0])
    order = np.argsort(lin)
    lin_s = lin[order]
    tgt_s = tgt[order]
    starts = np.searchsorted(lin_s, np.unique(lin_s))
    sums = np.add.reduceat(tgt_s, starts)
    cnts = np.diff(np.append(starts, len(lin_s)))[:, None]
    means = sums / cnts
    # per-voxel covariances (vectorized two-pass)
    sq = np.add.reduceat(np.einsum("ni,nj->nij", tgt_s, tgt_s).reshape(len(tgt_s), 9), starts)
    covs = sq.reshape(-1, 3, 3) / cnts[:, :, None] \
        - np.einsum("ni,nj->nij", means, means)
    covs += 1e-3 * np.eye(3)
    icovs = np.linalg.inv(covs)
    uniq = np.unique(lin_s)
    vox_of = {int(u): i for i, u in enumerate(uniq)}
    cur = src.copy()
    gauss_d1, gauss_d2 = 1.0, 0.05
    for _ in range(iters):
        c = np.floor(cur / resolution).astype(np.int64)
        l = ((c[:, 2] - cmin[2]) * span[1] + (c[:, 1] - cmin[1])) \
            * span[0] + (c[:, 0] - cmin[0])
        vi = np.searchsorted(uniq, l)
        vi = np.clip(vi, 0, len(uniq) - 1)
        hit = uniq[vi] == l
        mu = means[vi]
        ic = icovs[vi]
        d = cur - mu
        icd = np.einsum("nij,nj->ni", ic, d)
        e = np.exp(-0.5 * gauss_d2 * np.einsum("ni,ni->n", d, icd))
        w = np.where(hit, gauss_d1 * gauss_d2 * e, 0.0)
        # analytic gradient/Hessian over the 6-pose (small-angle jacobian)
        J = np.zeros((n, 3, 6), np.float32)
        J[:, :, :3] = np.eye(3)
        px, py, pz = cur[:, 0], cur[:, 1], cur[:, 2]
        J[:, 0, 4], J[:, 0, 5] = pz, -py
        J[:, 1, 3], J[:, 1, 5] = -pz, px
        J[:, 2, 3], J[:, 2, 4] = py, -px
        icJ = np.einsum("nij,njk->nik", ic, J)
        grad = np.einsum("n,ni,nik->k", w, d, icJ)
        H = np.einsum("n,nij,nik->jk", w, icJ, icJ)
        delta = np.linalg.solve(H + 1e-6 * np.eye(6), -grad)
        # one More-Thuente-style score re-evaluation at the trial step
        trial = cur + delta[:3][None, :].astype(np.float32)
        dt = trial - mu
        _ = np.exp(-0.5 * gauss_d2 * np.einsum("ni,nij,nj->n", dt, ic, dt))
        cur = trial
    return iters / (time.perf_counter() - t0)


def main():
    quick = "--quick" in sys.argv
    out = {}

    table = _load(TABLE)
    milk = _load(MILK)
    print(f"table {len(table)} pts, milk {len(milk)} pts", file=sys.stderr)

    for name, cloud in (("table", table), ("milk", milk)):
        out[f"voxel_grid_ms_{name}"] = round(_time_ms(
            lambda c=cloud: bm_voxel_grid(c), label=f"voxel_grid_{name}"), 3)
        out[f"approx_voxel_grid_ms_{name}"] = out[f"voxel_grid_ms_{name}"]
    out["radius_outlier_removal_ms_table"] = round(
        _time_ms(lambda: bm_radius_outlier(table), label="radius_outlier"), 3)
    out["normal_estimation_ms_milk"] = round(
        _time_ms(lambda: bm_normals(milk), label="normals"), 3)
    milk_n = bm_normals(milk)
    out["shot_ms_milk"] = round(_time_ms(
        lambda: bm_shot(milk, milk_n), label="shot"), 3)
    out["radius_search_ms_table"] = round(_time_ms(
        lambda: bm_radius_search(table), label="radius_search"), 3)
    table_n = bm_normals(table)
    out["sac_cylinder_ms_table"] = round(_time_ms(
        lambda: bm_sac_cylinder(table, table_n), label="sac_cylinder"), 3)

    # voxel grid at 1M (the scaling point past the 209k fixtures)
    rngv = np.random.default_rng(0)
    big = rngv.uniform(-50, 50, size=(1_000_000, 3)).astype(np.float32)
    out["voxel_grid_ms_1m"] = round(
        _time_ms(lambda: bm_voxel_grid(big, 0.2), label="voxel_1m"), 3)

    # kNN16 at 120k (the north-star kNN metric's CPU side)
    rng = np.random.default_rng(0)
    tgt = rng.uniform(-50, 50, size=(120_000, 3)).astype(np.float32)
    srcq = tgt + rng.normal(scale=0.05, size=tgt.shape).astype(np.float32)
    tree = cKDTree(tgt)
    t0 = time.perf_counter()
    tree.query(srcq, k=16, workers=1)
    out["knn16_queries_per_sec_120k"] = round(
        120_000 / (time.perf_counter() - t0))

    n_big = 200_000 if quick else 1_000_000
    ips, build_s = icp_iters_per_sec(n_big)
    out[f"icp_iters_per_sec_{'200k' if quick else '1m'}"] = round(ips, 3)
    out["icp_tree_build_s_1m" if not quick else "icp_tree_build_s_200k"] = round(build_s, 3)

    # GICP / NDT proxies at the bench.py configs (120k pair, 20 iters;
    # VERDICT r3 #3) + the >=500k-scale GICP point
    n_gicp = 20_000 if quick else 120_000
    out[f"gicp_iters_per_sec_{'20k' if quick else '120k'}"] = round(
        gicp_iters_per_sec(n_gicp), 3)
    out[f"ndt_iters_per_sec_{'20k' if quick else '120k'}"] = round(
        ndt_iters_per_sec(n_gicp), 3)
    if not quick:
        out["gicp_iters_per_sec_500k"] = round(
            gicp_iters_per_sec(500_000), 3)

    with open(os.path.join(os.path.dirname(__file__), "BASELINE_CPU.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
