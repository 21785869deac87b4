"""True multi-process DCN test (VERDICT r3 #7): two jax.distributed CPU
processes, each with 4 virtual devices, form a hybrid (dcn=2, ici=4) mesh
through parallel/runtime.initialize_multihost and run sharded ICP whose
collectives genuinely cross the process boundary."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

_WORKER = os.path.join(os.path.dirname(__file__), "multihost_worker.py")


@pytest.mark.slow
def test_two_process_dcn_sharded_icp():
    port = 8476
    coordinator = f"localhost:{port}"
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, coordinator, "2", str(rank)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env, cwd=os.path.dirname(os.path.dirname(_WORKER)))
        for rank in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, f"worker failed rc={rc}\nstdout:{out}\nstderr:{err}"
    results = [json.loads(out.strip().splitlines()[-1])
               for _, out, _ in outs]
    # both ranks agree on the mesh and the recovered transform
    for r in results:
        assert r["mesh"] == {"dcn": 2, "ici": 4}
        assert r["devices"] == 8
        assert r["err"] < 1e-3, r
    np.testing.assert_allclose(results[0]["t"], results[1]["t"], atol=1e-6)
