"""Multi-chip TSDF fusion — volume sharded across the mesh.

The TPU answer to kinfu_large_scale's cyclical buffer (reference:
gpu/kinfu_large_scale/include/pcl/gpu/kinfu_large_scale/cyclical_buffer.h:
116-234, SURVEY §3.5): instead of shifting a single-device volume and
spilling slices to the host, the volume lives SHARDED over the device mesh
(x-axis slabs). Integration is per-voxel local — each device fuses its slab
against the (replicated) depth frame with zero communication. The projective
ICP odometry reduces a 6x6 system with one psum (see icp_sharded). Raycast
across slab boundaries is the halo-exchange consumer (ppermute of boundary
planes); single-slab raycast is exact whenever a ray's zero crossing lies
within one slab + the 1-voxel trilinear halo.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pcl_tpu.fusion.tsdf import TSDFVolume, Intrinsics


def sharded_integrate(mesh: Mesh, axis: str = "points"):
    """Build a jittable sharded integrate: volume tsdf/weight sharded on
    their first (x) axis, depth/pose replicated."""

    def body(tsdf, weight, origin, voxel_size, trunc, depth, w2c, fx, fy, cx, cy):
        # local slab: its x-offset in the global grid
        n_dev = jax.lax.axis_size(axis)
        my = jax.lax.axis_index(axis)
        Rl = tsdf.shape[0]
        H, W = depth.shape
        x0 = my * Rl
        idx = jnp.arange(Rl, dtype=jnp.float32) + x0
        idy = jnp.arange(tsdf.shape[1], dtype=jnp.float32)
        idz = jnp.arange(tsdf.shape[2], dtype=jnp.float32)
        gx, gy, gz = jnp.meshgrid(idx, idy, idz, indexing="ij")
        centers = jnp.stack([gx, gy, gz], axis=-1) + 0.5
        world = origin + centers * voxel_size
        cam = world @ w2c[:3, :3].T + w2c[:3, 3]
        z = cam[..., 2]
        u = fx * cam[..., 0] / jnp.maximum(z, 1e-9) + cx
        v = fy * cam[..., 1] / jnp.maximum(z, 1e-9) + cy
        ui = jnp.round(u).astype(jnp.int32)
        vi = jnp.round(v).astype(jnp.int32)
        inb = (z > 0) & (ui >= 0) & (ui < W) & (vi >= 0) & (vi < H)
        d = depth[jnp.clip(vi, 0, H - 1), jnp.clip(ui, 0, W - 1)]
        valid = inb & (d > 0)
        sdf = d - z
        t_new = jnp.clip(sdf / trunc, -1.0, 1.0)
        update = valid & (sdf >= -trunc)
        w_add = update.astype(jnp.float32)
        w_new = jnp.minimum(weight + w_add, 128.0)
        t_out = jnp.where(
            update, (tsdf * weight + t_new) / jnp.maximum(weight + w_add, 1e-9), tsdf
        )
        return t_out, w_new

    spec_vol = P(axis, None, None)
    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(spec_vol, spec_vol, P(), P(), P(), P(), P(), P(), P(), P(), P()),
        out_specs=(spec_vol, spec_vol),
        check_vma=False,
    )


def integrate_sharded(
    mesh: Mesh,
    vol: TSDFVolume,
    depth: jax.Array,
    intr: Intrinsics,
    pose: jax.Array,
    axis: str = "points",
) -> TSDFVolume:
    """Convenience wrapper: places the volume sharded, runs one fused frame."""
    import dataclasses
    fn = sharded_integrate(mesh, axis)
    sh = NamedSharding(mesh, P(axis, None, None))
    tsdf = jax.device_put(vol.tsdf, sh)
    weight = jax.device_put(vol.weight, sh)
    w2c = jnp.linalg.inv(pose)
    t, w = jax.jit(fn)(
        tsdf, weight, vol.origin, vol.voxel_size, vol.trunc, depth, w2c,
        jnp.float32(intr.fx), jnp.float32(intr.fy),
        jnp.float32(intr.cx), jnp.float32(intr.cy),
    )
    return dataclasses.replace(vol, tsdf=t, weight=w)
