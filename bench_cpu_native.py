"""Measured C++ CPU baselines for the weakest-ratio microbench entries
(VERDICT r4 #3 mitigation; see REFBENCH_BUILD.json for why the reference's
own google-benchmark suite cannot be compiled in this image).

Compiles pcl_tpu/native/src/bench_native.cpp (single-threaded C++17 -O3,
re-implementing the reference's algorithm structure: voxel_grid.hpp
sort+segment-walk, kd-tree radius/kNN, normal_3d.hpp covariance+eigen33)
and runs it on the same fixtures/parameters bench_micro.py uses. Merges
``cpp_*`` entries into BASELINE_CPU.json.

Run on the driver host (CPU only): python bench_cpu_native.py
"""

import json
import os
import subprocess
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

ROOT = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(ROOT, "pcl_tpu", "native", "src", "bench_native.cpp")
BIN = os.path.join(ROOT, "pcl_tpu", "native", "bench_native")
REF = "/root/reference/test"


def build():
    cmd = ["g++", "-O3", "-march=native", "-std=c++17", SRC, "-o", BIN]
    subprocess.run(cmd, check=True, cwd=os.path.dirname(SRC))


def dump_xyz(pcd_path, out_path):
    from pcl_tpu.io import load_pcd

    cloud = load_pcd(pcd_path)
    xyz = np.asarray(cloud.xyz, np.float32)
    m = np.asarray(cloud.mask)
    xyz = xyz.copy()
    xyz[~m] = np.nan  # invalid points stay NaN, as in the reference fixture
    xyz.tofile(out_path)
    return xyz.shape[0]


def run(op, binfile, param, reps=5):
    out = subprocess.run([BIN, op, binfile, str(param), str(reps)],
                         check=True, capture_output=True, text=True)
    return json.loads(out.stdout.strip())


def main():
    build()
    tmp = "/tmp/pcl_tpu_fixtures"
    os.makedirs(tmp, exist_ok=True)
    table_bin = os.path.join(tmp, "table.bin")
    milk_bin = os.path.join(tmp, "milk.bin")
    dump_xyz(os.path.join(REF, "table_scene_mug_stereo_textured.pcd"),
             table_bin)
    dump_xyz(os.path.join(REF, "milk_cartoon_all_small_clorox.pcd"), milk_bin)

    results = {}
    # BM_VoxelGrid parameters (leaf 0.01, both fixtures)
    results["cpp_voxel_grid_ms_table"] = run("voxel", table_bin, 0.01)["ms"]
    results["cpp_voxel_grid_ms_milk"] = run("voxel", milk_bin, 0.01)["ms"]
    # 1M scaling point (bench_micro voxel_grid_ms_1m: leaf 0.2, uniform)
    rng = np.random.default_rng(0)
    big = rng.uniform(-50, 50, size=(1_000_000, 3)).astype(np.float32)
    big_bin = os.path.join(tmp, "big1m.bin")
    big.tofile(big_bin)
    results["cpp_voxel_grid_ms_1m"] = run("voxel", big_bin, 0.2, 3)["ms"]
    # BM_RadiusSearch (r=0.05 self-query, cap 32) and normals (k=16)
    results["cpp_radius_search_ms_table"] = run("radius", table_bin, 0.05,
                                                3)["ms"]
    results["cpp_normal_estimation_ms_milk"] = run("normal", milk_bin, 16,
                                                   3)["ms"]

    path = os.path.join(ROOT, "BASELINE_CPU.json")
    with open(path) as f:
        base = json.load(f)
    base.update(results)
    base["cpp_note"] = (
        "cpp_* entries: single-threaded C++17 -O3 measured on the driver "
        "host (pcl_tpu/native/src/bench_native.cpp), reference algorithm "
        "structure; see REFBENCH_BUILD.json for why the reference's own "
        "benchmarks cannot be compiled here")
    with open(path, "w") as f:
        json.dump(base, f, indent=1)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
