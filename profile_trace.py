"""Capture a jax.profiler trace of the 1M ICP iteration and rank TPU ops
by total duration (parses the xplane.pb directly)."""

import glob
import os
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import jax.numpy as jnp
import numpy as np

from pcl_tpu.core.cloud import Cloud
from pcl_tpu.registration.icp import icp, build_index


def main():
    n = 1_000_000
    rng = np.random.default_rng(0)
    tgt = rng.uniform(-50, 50, size=(n, 3)).astype(np.float32)
    src = tgt + rng.normal(scale=0.05, size=(n, 3)).astype(np.float32)
    src_c = Cloud(xyz=jnp.asarray(src), mask=jnp.ones((n,), bool))
    tgt_c = Cloud(xyz=jnp.asarray(tgt), mask=jnp.ones((n,), bool))
    table = build_index(tgt_c, 0.5, cell_cap=12, grid_dims=(103, 103, 103))
    jax.block_until_ready(table.data)

    def run():
        return icp(src_c, tgt_c, max_corr_dist=0.5, max_iterations=20,
                   transformation_eps=0.0, abs_mse_eps=0.0, rel_mse_eps=0.0,
                   cell_cap=12, grid_dims=(103, 103, 103), index=table)

    r = run()
    jax.block_until_ready(r.transform)
    tdir = "/tmp/icp_trace"
    os.system(f"rm -rf {tdir}")
    with jax.profiler.trace(tdir):
        r = run()
        jax.block_until_ready(r.transform)

    # parse the xplane
    paths = glob.glob(tdir + "/**/*.xplane.pb", recursive=True)
    print("xplane files:", paths, file=sys.stderr)
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    xs = xplane_pb2.XSpace()
    with open(paths[0], "rb") as f:
        xs.ParseFromString(f.read())
    for plane in xs.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name:
            continue
        print(f"== plane: {plane.name}")
        meta = {k: v.name for k, v in plane.event_metadata.items()}
        agg = {}
        for line in plane.lines:
            for ev in line.events:
                name = meta.get(ev.metadata_id, str(ev.metadata_id))
                agg[name] = agg.get(name, 0) + ev.duration_ps
        top = sorted(agg.items(), key=lambda kv: -kv[1])[:40]
        tot = sum(agg.values())
        print(f"total op-time: {tot/1e12*1000:.1f} ms (20 iters)")
        for name, ps in top:
            print(f"  {ps/1e12*1000:9.2f} ms  {name[:110]}")


if __name__ == "__main__":
    main()
