"""KinFu tracker loop — depth in, pose + fused volume out.

Re-design of pcl::gpu::kinfuLS::KinfuTracker::operator() (reference:
gpu/kinfu_large_scale/src/kinfu.cpp:563-690, SURVEY §3.5):

  bilateral filter -> vertex/normal maps -> projective point-to-plane ICP
  against the PREVIOUS frame's raycast -> integrate -> raycast.

The ICP odometry is the estimate_combined.cu reduction re-expressed as a
batched 6x6 normal-equation build (estimation.point_to_plane_system) under a
fixed-iteration scan; the whole step is host-loop-free except the final
state carry. The cyclical-buffer volume shifting of kinfu_large_scale is
future work for the multi-host mesh (SURVEY §2.15 halo exchange).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from pcl_tpu.core.transforms import se3_exp
from pcl_tpu.image.ops import gaussian_blur
from pcl_tpu.fusion.tsdf import (
    TSDFVolume, Intrinsics, integrate, raycast,
    depth_to_vertex_map, vertex_map_normals,
)


class KinfuState(NamedTuple):
    volume: TSDFVolume
    pose: jax.Array          # [4,4] camera-to-world
    prev_verts: jax.Array    # [H,W,3] world frame (last raycast)
    prev_normals: jax.Array  # [H,W,3]
    prev_hit: jax.Array      # [H,W]
    frame: jax.Array         # int32


def kinfu_init(volume: TSDFVolume, height: int, width: int,
               init_pose: Optional[jax.Array] = None) -> KinfuState:
    if init_pose is None:
        init_pose = jnp.eye(4, dtype=jnp.float32)
    z3 = jnp.zeros((height, width, 3), jnp.float32)
    return KinfuState(
        volume=volume,
        pose=init_pose.astype(jnp.float32),
        prev_verts=z3,
        prev_normals=z3,
        prev_hit=jnp.zeros((height, width), bool),
        frame=jnp.int32(0),
    )


def _projective_icp(
    verts_cam: jax.Array,     # [H,W,3] current frame, camera coords
    valid_cur: jax.Array,     # [H,W]
    prev_verts: jax.Array,    # [H,W,3] world
    prev_normals: jax.Array,  # [H,W,3] world
    prev_hit: jax.Array,      # [H,W]
    pose0: jax.Array,         # [4,4] initial camera-to-world
    intr: Intrinsics,
    prev_pose: jax.Array,     # [4,4] pose the prev maps were rendered from
    n_iters: int,
    dist_thresh: float,
    angle_thresh: float,
) -> jax.Array:
    """Point-to-plane alignment of the current depth against the previous
    raycast via projective data association (estimate_combined.cu)."""
    H, W, _ = verts_cam.shape
    w2c_prev = jnp.linalg.inv(prev_pose)

    def gn_iter(pose, _):
        pw = verts_cam @ pose[:3, :3].T + pose[:3, 3]      # [H,W,3] world
        # project into the PREVIOUS camera to find the associated pixel
        pc = pw @ w2c_prev[:3, :3].T + w2c_prev[:3, 3]
        z = pc[..., 2]
        u = jnp.round(intr.fx * pc[..., 0] / jnp.maximum(z, 1e-9) + intr.cx).astype(jnp.int32)
        v = jnp.round(intr.fy * pc[..., 1] / jnp.maximum(z, 1e-9) + intr.cy).astype(jnp.int32)
        inb = (z > 0) & (u >= 0) & (u < W) & (v >= 0) & (v < H)
        uc = jnp.clip(u, 0, W - 1)
        vc = jnp.clip(v, 0, H - 1)
        q = prev_verts[vc, uc]
        nq = prev_normals[vc, uc]
        hit = prev_hit[vc, uc]
        d = jnp.linalg.norm(pw - q, axis=-1)
        # current normals in world frame for the angle gate
        ncur = vertex_map_normals(
            jnp.where(valid_cur[..., None], pw, 0.0))
        cosang = jnp.abs(jnp.sum(ncur * nq, axis=-1))
        ok = valid_cur & inb & hit & (d < dist_thresh) & (cosang > jnp.cos(angle_thresh))
        w = ok.astype(jnp.float32).reshape(-1)
        src = pw.reshape(-1, 3)
        dst = q.reshape(-1, 3)
        nrm = nq.reshape(-1, 3)
        from pcl_tpu.registration.estimation import point_to_plane_system
        JtJ, Jtr, _ = point_to_plane_system(src, dst, nrm, w)
        Hm = JtJ + 1e-6 * jnp.trace(JtJ) / 6.0 * jnp.eye(6)
        xi = jnp.linalg.solve(Hm, -Jtr)
        n_ok = jnp.sum(w)
        xi = jnp.where(n_ok >= 6, xi, jnp.zeros(6))
        return se3_exp(xi) @ pose, None

    pose, _ = jax.lax.scan(gn_iter, pose0, None, length=n_iters)
    return pose


@partial(jax.jit, static_argnames=("icp_iters", "blur"))
def kinfu_step(
    state: KinfuState,
    depth: jax.Array,          # [H,W] meters; <=0 invalid
    intr: Intrinsics,
    *,
    icp_iters: int = 10,
    dist_thresh: float = 0.1,
    angle_thresh: float = jnp.pi / 6,
    blur: bool = True,
) -> KinfuState:
    """One fused-tracking step (kinfu.cpp frame loop)."""
    H, W = depth.shape
    d = jnp.where(depth > 0, depth, 0.0)
    if blur:
        ds = gaussian_blur(d, 5, 1.0)
        d = jnp.where(depth > 0, ds, 0.0)
    valid = d > 0
    verts_cam = depth_to_vertex_map(d, intr)

    first = state.frame == 0

    pose_tracked = _projective_icp(
        verts_cam, valid, state.prev_verts, state.prev_normals,
        state.prev_hit, state.pose, intr, state.pose,
        icp_iters, dist_thresh, angle_thresh,
    )
    pose = jnp.where(first, state.pose, pose_tracked)

    vol = integrate(state.volume, d, intr, pose)
    verts, normals, hit = raycast(vol, intr, pose, H, W)
    return KinfuState(
        volume=vol,
        pose=pose,
        prev_verts=verts,
        prev_normals=normals,
        prev_hit=hit,
        frame=state.frame + 1,
    )
