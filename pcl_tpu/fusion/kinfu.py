"""KinFu tracker loop — depth in, pose + fused volume out.

Re-design of pcl::gpu::kinfuLS::KinfuTracker::operator() (reference:
gpu/kinfu_large_scale/src/kinfu.cpp:563-690, SURVEY §3.5):

  bilateral filter -> depth pyramid -> vertex/normal maps -> COARSE-TO-FINE
  projective point-to-plane ICP against the previous frame's raycast ->
  tracking-lost check -> integrate -> raycast.

Reference parity points:
- preprocessing is a real edge-preserving bilateral filter
  (kinfu.cpp:327 bilateralFilter; here filters.fast_bilateral — a Gaussian
  would smear depth edges into phantom surfaces);
- odometry runs 3 pyramid levels with {10, 5, 4} iterations finest->coarsest
  (kinfu.cpp:487-510 loops level LEVELS-1..0 with icp_iterations_ = {10,5,4}
  indexed by level, kinfu.h:371) — single-level tracking loses fast motion;
- the ICP reduction is estimate_combined.cu re-expressed as a batched 6x6
  normal-equation build, fully on device;
- tracking-lost detection + reset (kinfu.h:222 icpIsLost, kinfu.cpp reset
  path): a frame whose alignment is degenerate (too few associations, wild
  pose jump, or non-finite solve) keeps the previous pose and is NOT
  integrated; ``state.lost`` reports it and ``kinfu_reset`` restarts.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from pcl_tpu.core.transforms import se3_exp
from pcl_tpu.filters.convolution import fast_bilateral
from pcl_tpu.fusion.tsdf import (
    TSDFVolume, Intrinsics, integrate, raycast,
    depth_to_vertex_map, vertex_map_normals,
)

# iterations per pyramid level, index = level (0 = finest) — reference
# kinfu.h:371 icp_iterations_{10, 5, 4}
LEVEL_ITERS = (10, 5, 4)


class KinfuState(NamedTuple):
    volume: TSDFVolume
    pose: jax.Array          # [4,4] camera-to-world
    prev_verts: jax.Array    # [H,W,3] world frame (last raycast)
    prev_normals: jax.Array  # [H,W,3]
    prev_hit: jax.Array      # [H,W]
    frame: jax.Array         # int32
    lost: jax.Array          # bool: last frame failed tracking


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
        lost=jnp.bool_(False),
    )


def kinfu_reset(state: KinfuState, volume: TSDFVolume,
                init_pose: Optional[jax.Array] = None) -> KinfuState:
    """Restart tracking after a lost frame (reference KinfuTracker::reset)."""
    H, W = state.prev_hit.shape
    return kinfu_init(volume, H, W, init_pose)


def _pyr_down_depth(d: jax.Array, sigma_depth: float = 0.1) -> jax.Array:
    """Validity- and discontinuity-aware 2x downsample (reference
    device pyrDown kernel: neighbors differing from the center by more than
    3 sigma_color are excluded from the average)."""
    H, W = d.shape
    b = d[: H - H % 2, : W - W % 2].reshape(H // 2, 2, W // 2, 2)
    v = b > 0
    # block reference depth: min of the valid entries (robust to fg/bg mix)
    ref = jnp.min(jnp.where(v, b, jnp.inf), axis=(1, 3))
    keep = v & (jnp.abs(b - ref[:, None, :, None]) < sigma_depth)
    s = jnp.sum(jnp.where(keep, b, 0.0), axis=(1, 3))
    c = jnp.sum(keep.astype(jnp.float32), axis=(1, 3))
    return jnp.where(c > 0, s / jnp.maximum(c, 1.0), 0.0)


def _pyr_down_map(vm: jax.Array, nm: jax.Array, hit: jax.Array):
    """2x downsample of raycast vertex/normal maps by hit-masked 2x2
    averaging (reference resizeVMap/resizeNMap average too). Point-sampling
    ([::2]) instead DECORRELATES the coarse texture from the area-averaged
    depth pyramid — residuals then look like noise at the texture amplitude
    and Gauss-Newton slides along the surface's degenerate directions
    (observed: level-2 walked 0.3 m off a flat-wall scene)."""
    H, W, _ = vm.shape
    Hc, Wc = H // 2, W // 2
    hb = hit[: 2 * Hc, : 2 * Wc].reshape(Hc, 2, Wc, 2)
    w = hb.astype(jnp.float32)[..., None]
    vb = vm[: 2 * Hc, : 2 * Wc].reshape(Hc, 2, Wc, 2, 3)
    nb = nm[: 2 * Hc, : 2 * Wc].reshape(Hc, 2, Wc, 2, 3)
    cnt = jnp.sum(w, axis=(1, 3))
    v_avg = jnp.sum(vb * w, axis=(1, 3)) / jnp.maximum(cnt, 1.0)
    n_sum = jnp.sum(nb * w, axis=(1, 3))
    n_avg = n_sum / jnp.maximum(
        jnp.linalg.norm(n_sum, axis=-1, keepdims=True), 1e-12)
    hit2 = cnt[..., 0] > 0
    return (jnp.where(hit2[..., None], v_avg, 0.0),
            jnp.where(hit2[..., None], n_avg, 0.0), hit2)


def _scale_intrinsics(intr: Intrinsics, level: int) -> Intrinsics:
    s = 0.5 ** level
    return Intrinsics(intr.fx * s, intr.fy * s,
                      (intr.cx + 0.5) * s - 0.5, (intr.cy + 0.5) * s - 0.5)


def _projective_icp(
    verts_cam: jax.Array,     # [H,W,3] current frame, camera coords
    valid_cur: jax.Array,     # [H,W]
    prev_verts: jax.Array,    # [H,W,3] world
    prev_normals: jax.Array,  # [H,W,3]
    prev_hit: jax.Array,      # [H,W]
    pose0: jax.Array,         # [4,4] initial camera-to-world
    intr: Intrinsics,
    prev_pose: jax.Array,     # [4,4] pose the prev maps were rendered from
    n_iters: int,
    dist_thresh: float,
    angle_thresh: float,
) -> Tuple[jax.Array, jax.Array]:
    """Point-to-plane alignment of the current depth against the previous
    raycast via projective data association (estimate_combined.cu:210-316).
    Returns (pose, n_ok at the last iteration)."""
    H, W, _ = verts_cam.shape
    w2c_prev = jnp.linalg.inv(prev_pose)
    # exclude the last row/col: image-grid normals come from forward
    # differences (jnp.roll wraps there, producing garbage normals that are
    # a large fraction of a COARSE pyramid level's pixels — 22% at 15x20 —
    # and biased the level-2 solve into wild translations)
    vv = jnp.arange(H)[:, None]
    uu = jnp.arange(W)[None, :]
    interior = (vv < H - 1) & (uu < W - 1)

    def gn_iter(carry, _):
        pose, _n = carry
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
        ok = (valid_cur & interior & inb & hit & (d < dist_thresh)
              & (cosang > jnp.cos(angle_thresh)))
        w = ok.astype(jnp.float32).reshape(-1)
        src = pw.reshape(-1, 3)
        dst = q.reshape(-1, 3)
        nrm = nq.reshape(-1, 3)
        from pcl_tpu.registration.estimation import point_to_plane_system
        JtJ, Jtr, _ = point_to_plane_system(src, dst, nrm, w)
        Hm = JtJ + 1e-6 * jnp.trace(JtJ) / 6.0 * jnp.eye(6)
        xi = jnp.linalg.solve(Hm, -Jtr)
        n_ok = jnp.sum(w)
        xi = jnp.where((n_ok >= 6) & jnp.all(jnp.isfinite(xi)), xi, jnp.zeros(6))
        return (se3_exp(xi) @ pose, n_ok), None

    (pose, n_ok), _ = jax.lax.scan(gn_iter, (pose0, jnp.float32(0.0)), None,
                                   length=n_iters)
    return pose, n_ok


def _rotation_angle(R: jax.Array) -> jax.Array:
    c = jnp.clip((jnp.trace(R) - 1.0) * 0.5, -1.0, 1.0)
    return jnp.arccos(c)


@partial(jax.jit, static_argnames=("levels", "bilateral",
                                   "max_step_trans", "max_step_rot",
                                   "min_corr_frac"))
def kinfu_step(
    state: KinfuState,
    depth: jax.Array,          # [H,W] meters; <=0 invalid
    intr: Intrinsics,
    *,
    levels: int = 3,
    dist_thresh: float = 0.1,
    angle_thresh: float = jnp.pi / 6,
    bilateral: bool = True,
    max_step_trans: float = 0.3,
    max_step_rot: float = 0.6,
    min_corr_frac: float = 0.05,
) -> KinfuState:
    """One fused-tracking step (kinfu.cpp:563 frame loop): bilateral,
    pyramid coarse-to-fine ICP, lost check, integrate, raycast."""
    H, W = depth.shape
    d = jnp.where(depth > 0, depth, 0.0)
    if bilateral:
        ds = fast_bilateral(d)
        d = jnp.where(depth > 0, ds, 0.0)

    # depth + previous-map pyramids (reference pyrDown/resizeVMap,
    # kinfu.cpp:340)
    depths = [d]
    pverts = [state.prev_verts]
    pnorms = [state.prev_normals]
    phits = [state.prev_hit]
    for _ in range(1, levels):
        depths.append(_pyr_down_depth(depths[-1]))
        pv, pn, ph = _pyr_down_map(pverts[-1], pnorms[-1], phits[-1])
        pverts.append(pv)
        pnorms.append(pn)
        phits.append(ph)

    first = state.frame == 0

    # coarse -> fine (kinfu.cpp:487-510)
    pose = state.pose
    n_ok = jnp.float32(0.0)
    for level in range(levels - 1, -1, -1):
        dl = depths[level]
        il = _scale_intrinsics(intr, level)
        verts_cam = depth_to_vertex_map(dl, il)
        pose, n_ok = _projective_icp(
            verts_cam, dl > 0, pverts[level], pnorms[level], phits[level],
            pose, il, state.pose,
            LEVEL_ITERS[min(level, len(LEVEL_ITERS) - 1)],
            dist_thresh, angle_thresh,
        )

    # tracking-lost check (kinfu.h:222): degenerate association count,
    # wild pose jump, or non-finite pose
    delta = jnp.linalg.inv(state.pose) @ pose
    trans = jnp.linalg.norm(delta[:3, 3])
    rot = _rotation_angle(delta[:3, :3])
    n_valid = jnp.maximum(jnp.sum((d > 0).astype(jnp.float32)), 1.0)
    lost = (~first) & (
        (n_ok < min_corr_frac * n_valid)
        | (trans > max_step_trans)
        | (rot > max_step_rot)
        | ~jnp.all(jnp.isfinite(pose))
    )
    pose = jnp.where(first | lost, state.pose, pose)

    # integrate + raycast only when tracking holds (a lost frame would
    # smear bad geometry into the volume)
    vol_new = integrate(state.volume, d, intr, pose)
    vol = jax.tree.map(
        lambda new, old: jnp.where(lost, old, new), vol_new, state.volume
    )
    verts, normals, hit = raycast(vol, intr, pose, H, W)
    return KinfuState(
        volume=vol,
        pose=pose,
        prev_verts=verts,
        prev_normals=normals,
        prev_hit=hit,
        frame=state.frame + 1,
        lost=lost,
    )
