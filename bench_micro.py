"""Microbenchmarks mirroring the reference's google-benchmark suite
(SURVEY §6 / reference benchmarks/CMakeLists.txt):

  BM_VoxelGrid / BM_ApproxVoxelGrid   (benchmarks/filters/voxel_grid.cpp)
  BM_RadiusOutlierRemoval             (benchmarks/filters/radius_outlier_removal.cpp)
  BM_NormalEstimation                 (benchmarks/features/normal_3d.cpp)
  BM_SHOT                             (benchmarks/features/shot.cpp)
  BM_RadiusSearch                     (benchmarks/search/radius_search.cpp)
  BM_SACModelCylinder                 (benchmarks/sample_consensus/sac_model_cylinder.cpp)

Same fixture clouds (table_scene_mug_stereo_textured.pcd,
milk_cartoon_all_small_clorox.pcd). Each prints ms/op (best of 3 after
warmup/compile) and writes MICROBENCH.json. Run on the real TPU:

    python bench_micro.py
"""

import json
import os
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

REF = "/root/reference/test"
TABLE = os.path.join(REF, "table_scene_mug_stereo_textured.pcd")
MILK = os.path.join(REF, "milk_cartoon_all_small_clorox.pcd")


def _time_ms(op, cloud, reps=3, iters=8, perturb_attr=None):
    """In-jit scan timing: ``iters`` applications of ``op`` to a
    per-iteration-perturbed cloud inside ONE compiled loop, total / iters.

    Methodology (r4): the driver tunnel both memoizes identical dispatches
    (same executable + same buffers returns cached results in ~0 time) and
    adds ~25 ms host<->device sync latency per round trip — so neither
    single calls nor same-args pipelining measure device time. A
    lax.scan whose body consumes a data-dependent perturbation and feeds
    a scalar of its output into the carry is immune to both: every
    iteration genuinely executes on device, and the one dispatch's latency
    amortizes over ``iters``."""
    from pcl_tpu.core.cloud import Cloud as _C

    @jax.jit
    def run():
        def step(c, k):
            eps = c + k.astype(jnp.float32) * 1e-7
            cl = _C(xyz=cloud.xyz + eps, mask=cloud.mask, attrs=cloud.attrs,
                    width=cloud.width, height=cloud.height)
            out = op(cl)
            dep = jnp.ravel(out)[0].astype(jnp.float32)
            return c + dep * 0.0, ()
        c, _ = jax.lax.scan(step, jnp.float32(0.0),
                            jnp.arange(iters, dtype=jnp.int32))
        return c

    jax.block_until_ready(run())
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(run())
        ts.append((time.perf_counter() - t0) / iters)
    return min(ts) * 1e3


def main():
    from pcl_tpu.io import load_pcd
    from pcl_tpu import filters, features, sac
    from pcl_tpu.search import cell_list

    table = load_pcd(TABLE)
    milk = load_pcd(MILK)
    results = {}

    # BM_VoxelGrid: 0.01 leaf on both clouds (reference voxel_grid.cpp:9-46)
    for name, cloud in (("table", table), ("milk", milk)):
        results[f"voxel_grid_ms_{name}"] = round(_time_ms(
            lambda c: filters.voxel_downsample(c, 0.01).xyz, cloud), 3)
        results[f"approx_voxel_grid_ms_{name}"] = round(_time_ms(
            lambda c: filters.approximate_voxel_grid(c, 0.01).xyz, cloud), 3)

    # scaling point beyond the reference's fixtures (1M random points)
    rng_big = np.random.default_rng(0)
    big = rng_big.uniform(-50, 50, size=(1_000_000, 3)).astype(np.float32)
    from pcl_tpu.core.cloud import Cloud
    big_cloud = Cloud(xyz=jnp.asarray(big), mask=jnp.ones(len(big), bool))
    results["voxel_grid_ms_1m"] = round(_time_ms(
        lambda c: filters.voxel_downsample(c, 0.2).xyz, big_cloud), 3)

    # BM_RadiusOutlierRemoval: r=0.02, min 14 neighbors — the jittable
    # decision core (keep + ambiguous); on this fixture the ambiguous set
    # is empty so the full filter does no additional device work
    results["radius_outlier_removal_ms_table"] = round(_time_ms(
        lambda c: filters.radius_outlier_keep(c, 0.02, 14)[0],
        table, iters=4), 3)

    # BM_NormalEstimation: k=16 on milk (reference normal_3d.cpp)
    results["normal_estimation_ms_milk"] = round(_time_ms(
        lambda c: features.estimate_normals(c, k=16).attrs["normal"],
        milk), 3)

    # BM_SHOT: radius 0.05 on milk with normals (reference-exact
    # interpolated SHOT — the default since r4)
    milk_n = features.estimate_normals(milk, k=16)
    results["shot_ms_milk"] = round(_time_ms(
        lambda c: features.estimate_shot(c, radius=0.05, k=32),
        milk_n, iters=4), 3)

    # BM_RadiusSearch: r=0.05 self-query on table via the cell list
    # (table rebuilt per iteration would hide the query cost; build is
    # hoisted by closing over the prebuilt table and perturbing queries)
    tab = cell_list.build(table.xyz, table.mask, jnp.float32(0.05),
                          table_size=1 << 16, cap=32)
    jax.block_until_ready(tab.data)
    results["radius_search_ms_table"] = round(_time_ms(
        lambda c: cell_list.radius_search(tab, c.xyz, 0.05, cap_out=32)[0],
        table), 3)

    # BM_SACModelCylinder: distance scoring of 1024 batched hypotheses
    from pcl_tpu.segmentation import sac_segmentation
    table_n = features.estimate_normals(table, k=16)
    results["sac_cylinder_ms_table"] = round(_time_ms(
        lambda c: sac_segmentation(c, sac.CylinderModel(), 0.02,
                                   n_hypotheses=1024).inliers, table_n), 3)

    # reference-side ratio columns: CPU proxy baselines measured by
    # bench_cpu_baseline.py with the same fixtures/parameters
    # (VERDICT r2 missing #3). vs_baseline_* > 1 means the TPU path wins.
    try:
        with open(os.path.join(os.path.dirname(__file__),
                               "BASELINE_CPU.json")) as f:
            cpu = json.load(f)
        for k in list(results):
            if k in cpu and results[k] > 0:
                results[f"vs_baseline_{k.replace('_ms_', '_')}"] = round(
                    cpu[k] / results[k], 2)
            # measured single-threaded C++ -O3 baselines where available
            # (bench_cpu_native.py; REFBENCH_BUILD.json for provenance)
            if f"cpp_{k}" in cpu and results[k] > 0:
                results[f"vs_cpp_{k.replace('_ms_', '_')}"] = round(
                    cpu[f"cpp_{k}"] / results[k], 2)
    except Exception:  # noqa: BLE001
        pass

    with open(os.path.join(os.path.dirname(__file__), "MICROBENCH.json"), "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
