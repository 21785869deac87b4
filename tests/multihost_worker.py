"""Worker process for the true multi-process DCN test
(tests/test_multihost.py, VERDICT r3 #7). Launched once per rank:

    python multihost_worker.py <coordinator> <nprocs> <rank>

Each rank owns 4 virtual CPU devices; the 2-rank run forms a (dcn=2,
ici=4) hybrid mesh whose outer axis genuinely crosses a process boundary.
Runs sharded point-to-point ICP on a deterministic pair and prints the
recovered translation as JSON on the last line.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    coordinator, nprocs, rank = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=4")
    import jax
    jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:  # noqa: BLE001 — older/newer flag name; default works
        pass
    import numpy as np

    # distributed init MUST precede anything that initializes the XLA
    # backend — pcl_tpu's package __init__ touches devices, so import only
    # the runtime module (jax + Mesh types) first
    from pcl_tpu.parallel.runtime import (hybrid_mesh, initialize_multihost,
                                          mesh_info)

    is_multi = initialize_multihost(coordinator_address=coordinator,
                                    num_processes=nprocs, process_id=rank)
    import jax.numpy as jnp
    from pcl_tpu.parallel.icp_sharded import sharded_icp
    assert is_multi, "expected a multi-process runtime"
    assert jax.process_count() == nprocs
    assert len(jax.devices()) == 4 * nprocs, len(jax.devices())

    mesh = hybrid_mesh()
    info = mesh_info(mesh)
    assert info == {"dcn": nprocs, "ici": 4}, info

    rng = np.random.default_rng(0)
    n = 4096
    tgt = rng.uniform(-1, 1, size=(n, 3)).astype(np.float32)
    shift = np.array([0.05, -0.03, 0.02], np.float32)
    src = (tgt + shift).astype(np.float32)
    T, mse, iters = sharded_icp(
        mesh,
        jnp.asarray(src), jnp.ones((n,), bool),
        jnp.asarray(tgt), jnp.ones((n,), bool),
        max_corr_dist=0.5, max_iterations=20,
        axis=("dcn", "ici"),   # points sharded over BOTH axes: the moment
                               # psum genuinely crosses the process (dcn)
                               # boundary
    )
    t = np.asarray(T)[:3, 3]
    err = float(np.linalg.norm(t + shift))
    print(json.dumps({"rank": rank, "t": t.tolist(), "err": err,
                      "mse": float(np.asarray(mse)),
                      "devices": len(jax.devices()),
                      "mesh": info}))
    return 0 if err < 1e-3 else 1


if __name__ == "__main__":
    sys.exit(main())
