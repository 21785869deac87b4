"""Voxel-grid scatter-floor attack experiments (VERDICT r4 #9).

Measures, at the table-scene fixture scale (307k organized frame):
  a) production voxel_downsample (baseline)
  b) payload sort (x,y,z ride the key sort) + sorted-order segment_sum
     with indices_are_sorted=True — does XLA lower a sorted scatter
     better than the original-order scatter?
  c) the Pallas chunked segmented-reduce (ops/pallas_segsum.py), if present
Writes PROFILE_VOXEL.json.
"""

import json
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import jax.numpy as jnp
import numpy as np

from pcl_tpu.io import load_pcd
from pcl_tpu import filters
from pcl_tpu.core.cloud import Cloud

TABLE = "/root/reference/test/table_scene_mug_stereo_textured.pcd"
_I32_BIG = jnp.int32(2**31 - 1)


def _time_ms(make_op, cloud, reps=3, iters=8):
    @jax.jit
    def run():
        def step(c, k):
            cl = Cloud(xyz=cloud.xyz + c + k.astype(jnp.float32) * 1e-7,
                       mask=cloud.mask)
            out = make_op(cl)
            return c + jnp.ravel(out)[0].astype(jnp.float32) * 0.0, ()
        c, _ = jax.lax.scan(step, jnp.float32(0.0),
                            jnp.arange(iters, dtype=jnp.int32))
        return c

    jax.block_until_ready(run())
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(run())
        ts.append((time.perf_counter() - t0) / iters)
    return round(min(ts) * 1e3, 3)


def sorted_segsum_variant(cloud, leaf=0.01, sorted_hint=True):
    """b): payload sort carries coords; scatter in sorted seg order."""
    xyz, mask = cloud.xyz, cloud.mask
    n = xyz.shape[0]
    leaf3 = jnp.broadcast_to(jnp.asarray(leaf, jnp.float32), (3,))
    coords = jnp.floor(xyz / leaf3).astype(jnp.int32)
    cmin = jnp.min(jnp.where(mask[:, None], coords, _I32_BIG), axis=0)
    cmax = jnp.max(jnp.where(mask[:, None], coords, -_I32_BIG), axis=0)
    span = jnp.maximum(cmax - cmin + 1, 1)
    rel = jnp.clip(coords - cmin[None, :], 0, None)
    lin = (rel[:, 2] * span[1] + rel[:, 1]) * span[0] + rel[:, 0]
    lin = jnp.where(mask, lin, _I32_BIG)
    key, xs, ys, zs, ws = jax.lax.sort(
        (lin, xyz[:, 0], xyz[:, 1], xyz[:, 2],
         mask.astype(jnp.float32)), num_keys=1)
    first = key != jnp.roll(key, 1)
    first = first.at[0].set(True)
    valid_s = key != _I32_BIG
    first = first & valid_s
    seg = jnp.cumsum(first.astype(jnp.int32)) - 1
    seg = jnp.where(valid_s, seg, n - 1)
    w = jnp.where(valid_s, ws, 0.0)
    sums = jnp.stack([
        jax.ops.segment_sum(v * w, seg, num_segments=n,
                            indices_are_sorted=sorted_hint)
        for v in (xs, ys, zs)], axis=1)
    cnt = jax.ops.segment_sum(w, seg, num_segments=n,
                              indices_are_sorted=sorted_hint)
    cents = sums / jnp.maximum(cnt, 1.0)[:, None]
    nv = jnp.sum(first.astype(jnp.int32))
    return jnp.where((jnp.arange(n) < nv)[:, None], cents, 0.0)


def main():
    table = load_pcd(TABLE)
    cloud = Cloud(xyz=table.xyz, mask=table.mask)  # xyz-only, as the bench op
    out = {}
    out["a_production_ms"] = _time_ms(
        lambda c: filters.voxel_downsample(c, 0.01).xyz, cloud)
    out["b_sorted_segsum_ms"] = _time_ms(
        lambda c: sorted_segsum_variant(c), cloud)
    out["b2_sorted_segsum_nohint_ms"] = _time_ms(
        lambda c: sorted_segsum_variant(c, sorted_hint=False), cloud)
    try:
        from pcl_tpu.ops.pallas_segsum import voxel_centroids_pallas
        out["c_pallas_segsum_ms"] = _time_ms(
            lambda c: voxel_centroids_pallas(c, 0.01)[0], cloud)
    except ImportError:
        pass
    print(json.dumps(out, indent=1))
    with open("/root/repo/PROFILE_VOXEL.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
