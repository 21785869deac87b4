"""Multi-host runtime: distributed init, hybrid ICI x DCN meshes, and
checkpointed restart.

The reference has no distributed runtime at all (SURVEY §2.15/§5 — single
process, OpenMP threads, one CUDA device). The TPU-native framework needs
one for pod-slice / multi-host deployments:

- ``initialize_multihost``: ``jax.distributed.initialize`` wrapper — the
  NCCL-bootstrap analog. Env-driven (COORDINATOR_ADDRESS / NUM_PROCESSES /
  PROCESS_ID, or the cloud-TPU auto-detection built into jax), idempotent,
  and a no-op for single-process runs so the same program runs everywhere.
- ``hybrid_mesh``: a 2-D ``Mesh`` with a fast inner axis (ICI, intra-slice)
  and a slow outer axis (DCN, across hosts). Shard point/volume axes over
  ICI; keep DCN for the rare global reductions (pose-graph psum, TSDF world
  block migration) — the scaling-book recipe: collectives ride ICI, DCN
  only crosses host boundaries.
- ``CheckpointedPoses``: failure detection/recovery for long mapping runs
  (SURVEY §5 names this as a TPU-build obligation; the reference's closest
  analog is KinFu's tracking-lost reset, kinfu.h:222): every committed
  frame/scan pose is journaled to disk; after preemption the pipeline
  resumes from the last good pose instead of re-integrating from scratch.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh

ICI_AXIS = "ici"     # fast axis: chips within a slice
DCN_AXIS = "dcn"     # slow axis: across hosts

_initialized = False


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Bring up the JAX distributed runtime (multi-controller). Returns True
    when running multi-process, False for a plain single-process run.

    Args default from the environment (PCL_TPU_COORDINATOR / PCL_TPU_NPROCS /
    PCL_TPU_PROC_ID); on cloud TPU pods jax auto-detects all three. Safe to
    call twice (idempotent) and safe to call single-process (no-op)."""
    global _initialized
    coordinator_address = coordinator_address or os.environ.get("PCL_TPU_COORDINATOR")
    if num_processes is None and "PCL_TPU_NPROCS" in os.environ:
        num_processes = int(os.environ["PCL_TPU_NPROCS"])
    if process_id is None and "PCL_TPU_PROC_ID" in os.environ:
        process_id = int(os.environ["PCL_TPU_PROC_ID"])
    if coordinator_address is None and num_processes is None:
        return False  # single process — nothing to initialize
    if not _initialized:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        _initialized = True
    return jax.process_count() > 1


def hybrid_mesh(
    ici_axis: str = ICI_AXIS,
    dcn_axis: str = DCN_AXIS,
    dcn_size: Optional[int] = None,
) -> Mesh:
    """2-D device mesh (dcn, ici): inner axis spans each host's local chips
    (ICI-connected), outer axis spans hosts (DCN). Multi-process: derived
    from jax.process_count(). Single-process: ``dcn_size`` simulates the
    host split (for virtual-device testing); default 1."""
    devices = jax.devices()
    n = len(devices)
    if jax.process_count() > 1:
        per_host = jax.local_device_count()
        n_hosts = jax.process_count()
        # order devices host-major so rows of the mesh are DCN-contiguous
        # (jax.devices() is already sorted by process_index, id)
        arr = np.asarray(devices).reshape(n_hosts, per_host)
    else:
        dcn = dcn_size or 1
        if n % dcn:
            raise ValueError(f"{n} devices don't split into {dcn} host groups")
        arr = np.asarray(devices).reshape(dcn, n // dcn)
    return Mesh(arr, (dcn_axis, ici_axis))


def mesh_info(mesh: Mesh) -> Dict[str, int]:
    return {name: size for name, size in mesh.shape.items()}


class CheckpointedPoses:
    """Append-only pose journal for elastic mapping pipelines.

    One JSON line per committed frame: {"frame": i, "pose": 16 floats}.
    ``resume()`` returns (next_frame, last_pose) — after preemption the
    caller re-enters its frame loop there. Writes are atomic-append (one
    line per commit) so a crash mid-write loses at most the current frame."""

    def __init__(self, path: str):
        self.path = path

    def commit(self, frame: int, pose) -> None:
        rec = {"frame": int(frame),
               "pose": np.asarray(pose, np.float64).reshape(-1).tolist()}
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")

    def resume(self) -> Tuple[int, np.ndarray]:
        """(next frame index to process, last committed pose [4,4])."""
        if not os.path.exists(self.path):
            return 0, np.eye(4, dtype=np.float32)
        last = None
        with open(self.path) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                try:
                    last = json.loads(line)
                except json.JSONDecodeError:
                    break  # torn final line from a crash — ignore it
        if last is None:
            return 0, np.eye(4, dtype=np.float32)
        pose = np.asarray(last["pose"], np.float32).reshape(4, 4)
        return int(last["frame"]) + 1, pose

    def poses(self) -> List[np.ndarray]:
        out = []
        if not os.path.exists(self.path):
            return out
        with open(self.path) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                try:
                    rec = json.loads(line)
                except json.JSONDecodeError:
                    break
                out.append(np.asarray(rec["pose"], np.float32).reshape(4, 4))
        return out
