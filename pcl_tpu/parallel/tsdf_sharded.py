"""Multi-chip TSDF fusion — volume sharded across the mesh, halo exchange.

The TPU answer to kinfu_large_scale's cyclical buffer (reference:
gpu/kinfu_large_scale/include/pcl/gpu/kinfu_large_scale/cyclical_buffer.h:
116-234, SURVEY §3.5): instead of shifting a single-device volume and
spilling slices to the host, the volume lives SHARDED over the device mesh
(x-axis slabs).

- ``sharded_integrate``: per-voxel local — each device fuses its slab
  against the (replicated) depth frame with zero communication.
- ``sharded_raycast``: each device holds its slab plus ``halo`` boundary
  planes exchanged with its x-neighbors over ICI via ``jax.lax.ppermute``;
  every device marches all rays but only evaluates samples whose trilinear
  support lies in its extended slab; the global hit is a ``pmin`` over the
  mesh and normals are ownership-masked ``psum``s. Exact parity with the
  replicated ``fusion.tsdf.raycast`` whenever ``halo`` covers one ray step
  (the wrapper enforces this).
- ``sharded_shift_x``: the cyclical-buffer advance re-derived for a sharded
  volume — each device's slab is replaced by its +x neighbor's via one
  ``ppermute`` ring step; the evicted (-x) slab is returned for the host
  world model (reference performShift/shiftOrigin, cyclical_buffer.h:130,234)
  and the entering slab starts empty.

The projective ICP odometry reduces a 6x6 system with one psum (see
icp_sharded).
"""

from __future__ import annotations

import dataclasses
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


def _ring_perm(n: int, shift: int):
    """Source -> destination pairs sending each device's payload to
    (device + shift) % n."""
    return [(i, (i + shift) % n) for i in range(n)]


def sharded_raycast(
    mesh: Mesh,
    height: int,
    width: int,
    *,
    axis: str = "points",
    halo: int = 4,
    near: float = 0.1,
    far: float = 5.0,
    n_steps: int = 256,
):
    """Build a jittable sharded raycast over x-slab TSDF shards.

    Returns fn(tsdf, weight_unused, origin, voxel_size, intr 4-tuple, pose)
    -> (verts [H,W,3], normals [H,W,3], hit [H,W]) — replicated outputs.

    Correctness contract: each ray-march step advances (far-near)/n_steps;
    a crossing straddling a slab boundary is owned by whichever device's
    extended slab (slab + ``halo`` exchanged planes per side) contains both
    samples' trilinear support — guaranteed when
    ``halo * voxel_size >= step + voxel_size``. ``raycast_sharded`` checks
    this and raises otherwise.
    """
    step = (far - near) / n_steps

    def body(tsdf, origin, voxel_size, fx, fy, cx, cy, pose):
        n_dev = jax.lax.axis_size(axis)
        my = jax.lax.axis_index(axis)
        Rl, Ry, Rz = tsdf.shape
        Rg = Rl * n_dev                       # global x resolution
        x0 = my * Rl                          # my slab's first global plane

        # --- halo exchange over ICI (the ppermute the cyclical buffer's
        # host shift becomes on a TPU mesh) ---
        # receive the LEFT neighbor's last `halo` planes (they send right)
        left_halo = jax.lax.ppermute(
            tsdf[Rl - halo:], axis, _ring_perm(n_dev, +1))
        # receive the RIGHT neighbor's first `halo` planes (they send left)
        right_halo = jax.lax.ppermute(
            tsdf[:halo], axis, _ring_perm(n_dev, -1))
        ext = jnp.concatenate([left_halo, tsdf, right_halo], axis=0)
        # ext plane e holds global plane x0 - halo + e (wrap-around halos at
        # the mesh ends alias the far side of the ring, but samples there
        # are outside the GLOBAL volume and the global gate handles them)

        def sample(pts):
            """Trilinear sample at world pts [...,3] ->
            (value, known): known = the value is locally determinable —
            either the support is inside my extended slab, or the point is
            outside the global volume (value = +1, same as the replicated
            raycast's out-of-volume convention)."""
            g = (pts - origin) / voxel_size - 0.5
            g0 = jnp.floor(g).astype(jnp.int32)
            f = g - g0
            inside_g = ((g0[..., 0] >= 0) & (g0[..., 0] < Rg - 1)
                        & (g0[..., 1] >= 0) & (g0[..., 1] < Ry - 1)
                        & (g0[..., 2] >= 0) & (g0[..., 2] < Rz - 1))
            # support needed: ext planes g0 and g0+1
            in_ext = (g0[..., 0] >= x0 - halo) & (g0[..., 0] + 1 <= x0 + Rl - 1 + halo)
            e0 = jnp.clip(g0[..., 0] - (x0 - halo), 0, Rl + 2 * halo - 2)
            y0 = jnp.clip(g0[..., 1], 0, Ry - 2)
            z0 = jnp.clip(g0[..., 2], 0, Rz - 2)

            def corner(dx, dy, dz):
                val = ext[e0 + dx, y0 + dy, z0 + dz]
                wx = f[..., 0] if dx else 1.0 - f[..., 0]
                wy = f[..., 1] if dy else 1.0 - f[..., 1]
                wz = f[..., 2] if dz else 1.0 - f[..., 2]
                return val * wx * wy * wz

            tri = sum(corner(a, b, c)
                      for a in (0, 1) for b in (0, 1) for c in (0, 1))
            val = jnp.where(inside_g, tri, 1.0)
            known = (~inside_g) | in_ext
            return val, known

        v, u = jnp.meshgrid(jnp.arange(height), jnp.arange(width), indexing="ij")
        dirs_cam = jnp.stack([
            (u.astype(jnp.float32) + 0.5 - cx) / fx,
            (v.astype(jnp.float32) + 0.5 - cy) / fy,
            jnp.ones((height, width), jnp.float32),
        ], axis=-1)
        dirs_cam = dirs_cam / jnp.linalg.norm(dirs_cam, axis=-1, keepdims=True)
        dirs = dirs_cam @ pose[:3, :3].T
        org = pose[:3, 3]

        def march(i, carry):
            t_hit, prev_val, prev_known, found = carry
            t = near + i * step
            p = org + t * dirs
            val, known = sample(p)
            crossing = prev_known & known & (prev_val > 0) & (val <= 0) & ~found
            denom = jnp.maximum(prev_val - val, 1e-9)
            t_cross = t - step + step * prev_val / denom
            t_hit = jnp.where(crossing, t_cross, t_hit)
            # once any locally-KNOWN crossing is found, stop updating; a ray
            # may also cross in a region this device cannot see — the pmin
            # below lets the owning device win
            return t_hit, val, known, found | crossing

        t0 = jnp.full((height, width), jnp.inf)
        v0 = jnp.ones((height, width))
        k0 = jnp.ones((height, width), bool)
        t_hit, _, _, found = jax.lax.fori_loop(
            0, n_steps, march, (t0, v0, k0, jnp.zeros((height, width), bool)))

        # global first crossing over the mesh
        t_glob = jax.lax.pmin(t_hit, axis)
        hit = jnp.isfinite(t_glob)
        owner = found & (t_hit <= t_glob)

        verts = org + jnp.where(hit[..., None], t_glob[..., None], 0.0) * dirs

        # normals: central TSDF differences at the hit, computed by owners,
        # combined by psum (owners at a shared boundary hold identical data)
        eps = voxel_size

        def grad_axis(ax):
            e = jnp.zeros((3,)).at[ax].set(eps)
            a, ka = sample(verts + e)
            b, kb = sample(verts - e)
            return a - b, ka & kb

        gx, kx = grad_axis(0)
        gy, ky = grad_axis(1)
        gz, kz = grad_axis(2)
        g_ok = owner & kx & ky & kz
        g = jnp.stack([gx, gy, gz], axis=-1)
        g = jnp.where(g_ok[..., None], g, 0.0)
        g = jax.lax.psum(g, axis)
        cnt = jax.lax.psum(g_ok.astype(jnp.float32), axis)
        g = g / jnp.maximum(cnt[..., None], 1.0)
        n = g / jnp.maximum(jnp.linalg.norm(g, axis=-1, keepdims=True), 1e-12)
        flip = jnp.sum(n * dirs, axis=-1) > 0
        n = jnp.where(flip[..., None], -n, n)
        # rays whose owners all lacked gradient support: face the camera
        no_grad = hit & (cnt == 0)
        n = jnp.where(no_grad[..., None], -dirs, n)
        verts = jnp.where(hit[..., None], verts, 0.0)
        n = jnp.where(hit[..., None], n, 0.0)
        return verts, n, hit

    spec_vol = P(axis, None, None)
    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(spec_vol, P(), P(), P(), P(), P(), P(), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )


def raycast_sharded(
    mesh: Mesh,
    vol: TSDFVolume,
    intr: Intrinsics,
    pose: jax.Array,
    height: int,
    width: int,
    *,
    axis: str = "points",
    near: float = 0.1,
    far: float = 5.0,
    n_steps: int = 256,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Convenience wrapper: shard the volume, raycast with a halo wide
    enough for the step length."""
    step = (far - near) / n_steps
    voxel = float(vol.voxel_size)
    halo = max(2, int(step / voxel) + 2)
    n_dev = mesh.shape[axis]
    Rl = vol.resolution // n_dev
    if halo > Rl:
        raise ValueError(
            f"halo {halo} exceeds slab width {Rl}: raise n_steps or volume "
            f"resolution (step {step:.4f} m, voxel {voxel:.4f} m)")
    fn = sharded_raycast(mesh, height, width, axis=axis, halo=halo,
                         near=near, far=far, n_steps=n_steps)
    sh = NamedSharding(mesh, P(axis, None, None))
    tsdf = jax.device_put(vol.tsdf, sh)
    return jax.jit(fn)(
        tsdf, vol.origin, vol.voxel_size,
        jnp.float32(intr.fx), jnp.float32(intr.fy),
        jnp.float32(intr.cx), jnp.float32(intr.cy),
        pose.astype(jnp.float32),
    )


def sharded_shift_x(mesh: Mesh, axis: str = "points"):
    """Build a jittable one-slab +x volume advance (the cyclical-buffer
    performShift re-derived, reference cyclical_buffer.h:130-234).

    fn(tsdf, weight) -> (tsdf', weight', evicted_tsdf, evicted_weight):
    device i's new slab = device i+1's old slab (one ppermute ring step);
    the last device's new slab is empty (tsdf=1, weight=0 — entering
    unobserved space); the evicted device-0 slab is returned REPLICATED so
    the host can push it into the world model. The caller advances
    ``origin.x`` by slab_width * voxel_size.
    """

    def body(tsdf, weight):
        n_dev = jax.lax.axis_size(axis)
        my = jax.lax.axis_index(axis)
        # everyone sends their slab one step LEFT (to device my-1)
        perm = _ring_perm(n_dev, -1)
        t_in = jax.lax.ppermute(tsdf, axis, perm)
        w_in = jax.lax.ppermute(weight, axis, perm)
        last = my == n_dev - 1
        t_new = jnp.where(last, jnp.ones_like(tsdf), t_in)
        w_new = jnp.where(last, jnp.zeros_like(weight), w_in)
        # the wrap-around payload device n-1 received IS device 0's evicted
        # slab; broadcast it to everyone via psum of the masked copy
        ev_t = jax.lax.psum(jnp.where(last, t_in, jnp.zeros_like(t_in)), axis)
        ev_w = jax.lax.psum(jnp.where(last, w_in, jnp.zeros_like(w_in)), axis)
        return t_new, w_new, ev_t, ev_w

    spec_vol = P(axis, None, None)
    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(spec_vol, spec_vol),
        out_specs=(spec_vol, spec_vol, P(), P()),
        check_vma=False,
    )


def shift_sharded(
    mesh: Mesh,
    vol: TSDFVolume,
    axis: str = "points",
) -> Tuple[TSDFVolume, jax.Array, jax.Array, jax.Array]:
    """Advance the sharded volume one slab along +x. Returns
    (vol', evicted_tsdf [Rl,R,R], evicted_weight, evicted_origin [3]) —
    push the evicted slab into a ``fusion.world_model.WorldModel``."""
    n_dev = mesh.shape[axis]
    Rl = vol.resolution // n_dev
    fn = sharded_shift_x(mesh, axis)
    sh = NamedSharding(mesh, P(axis, None, None))
    tsdf = jax.device_put(vol.tsdf, sh)
    weight = jax.device_put(vol.weight, sh)
    t, w, ev_t, ev_w = jax.jit(fn)(tsdf, weight)
    shift_m = Rl * vol.voxel_size
    new_origin = vol.origin + jnp.array([1.0, 0.0, 0.0]) * shift_m
    evicted_origin = vol.origin
    return (
        dataclasses.replace(vol, tsdf=t, weight=w, origin=new_origin),
        ev_t, ev_w, evicted_origin,
    )
