"""Host-side world model + TSDF volume checkpointing.

Reference parity:
- ``WorldModel`` <- pcl::kinfuLS::WorldModel
  (gpu/kinfu_large_scale/include/pcl/gpu/kinfu_large_scale/world_model.h):
  the unbounded map that receives TSDF slices evicted by the cyclical
  buffer's shift and hands previously-seen slices back when the window
  returns. The reference stores a point cloud of (x,y,z,intensity=tsdf);
  here slices stay dense numpy blocks keyed by their global voxel offset —
  cheaper to re-upload and exact to re-enter.
- ``save_tsdf`` / ``load_tsdf`` <- TsdfVolume::save/load
  (gpu/kinfu_large_scale/include/pcl/gpu/kinfu_large_scale/tsdf_volume.h)
  — checkpoint/resume of the fused volume.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import numpy as np

import jax.numpy as jnp

from pcl_tpu.fusion.tsdf import TSDFVolume


class WorldModel:
    """Unbounded TSDF world assembled from evicted x-slabs.

    Slabs are keyed by their global voxel x-offset (world_x = key *
    voxel_size relative to the world origin fixed at construction). Pushing
    a slab twice merges by TSDF weighted average — the same running-average
    rule integration uses.
    """

    def __init__(self, voxel_size: float, world_origin=(0.0, 0.0, 0.0)):
        self.voxel_size = float(voxel_size)
        self.world_origin = np.asarray(world_origin, np.float32)
        self._slabs: Dict[int, Tuple[np.ndarray, np.ndarray]] = {}

    def _key(self, origin_x: float) -> int:
        return int(round((float(origin_x) - float(self.world_origin[0]))
                         / self.voxel_size))

    def push_slab(self, origin_x: float, tsdf, weight) -> None:
        """Store an evicted slab whose first voxel plane sits at world x =
        ``origin_x`` (reference WorldModel::addSlice)."""
        key = self._key(origin_x)
        t = np.asarray(tsdf, np.float32)
        w = np.asarray(weight, np.float32)
        if key in self._slabs:
            t0, w0 = self._slabs[key]
            wsum = w0 + w
            t = np.where(wsum > 0, (t0 * w0 + t * w) / np.maximum(wsum, 1e-9),
                         np.maximum(t0, t))
            w = np.minimum(wsum, 128.0)
        self._slabs[key] = (t, w)

    def fetch_slab(self, origin_x: float, shape) -> Tuple[np.ndarray, np.ndarray]:
        """Retrieve the slab entering the window at ``origin_x`` (reference
        WorldModel::getExistingData); empty (tsdf=1, weight=0) if unseen."""
        key = self._key(origin_x)
        if key in self._slabs:
            t, w = self._slabs[key]
            if t.shape == tuple(shape):
                return t, w
        return np.ones(shape, np.float32), np.zeros(shape, np.float32)

    @property
    def n_slabs(self) -> int:
        return len(self._slabs)

    def extract_points(self, iso_band: float = 0.25) -> np.ndarray:
        """All near-surface voxel centers across stored slabs [N,3] world
        coordinates (reference getWorldAsCubes / cloud export)."""
        out = []
        for key, (t, w) in sorted(self._slabs.items()):
            sel = (np.abs(t) < iso_band) & (w > 0)
            gx, gy, gz = np.nonzero(sel)
            pts = np.stack([gx + key, gy, gz], axis=-1).astype(np.float32)
            out.append(self.world_origin + (pts + 0.5) * self.voxel_size)
        if not out:
            return np.zeros((0, 3), np.float32)
        return np.concatenate(out, axis=0)

    def save(self, path: str) -> None:
        keys = sorted(self._slabs)
        np.savez_compressed(
            path,
            voxel_size=self.voxel_size,
            world_origin=self.world_origin,
            keys=np.asarray(keys, np.int64),
            **{f"t{k}": self._slabs[k][0] for k in keys},
            **{f"w{k}": self._slabs[k][1] for k in keys},
        )

    @classmethod
    def load(cls, path: str) -> "WorldModel":
        z = np.load(path)
        wm = cls(float(z["voxel_size"]), z["world_origin"])
        for k in z["keys"]:
            wm._slabs[int(k)] = (z[f"t{int(k)}"], z[f"w{int(k)}"])
        return wm


def save_tsdf(path: str, vol: TSDFVolume) -> None:
    """Checkpoint a TSDF volume (reference TsdfVolume::save)."""
    np.savez_compressed(
        path,
        tsdf=np.asarray(vol.tsdf, np.float32),
        weight=np.asarray(vol.weight, np.float32),
        origin=np.asarray(vol.origin, np.float32),
        voxel_size=np.float32(vol.voxel_size),
        trunc=np.float32(vol.trunc),
    )


def load_tsdf(path: str) -> TSDFVolume:
    """Resume a TSDF volume (reference TsdfVolume::load)."""
    z = np.load(path)
    return TSDFVolume(
        tsdf=jnp.asarray(z["tsdf"]),
        weight=jnp.asarray(z["weight"]),
        origin=jnp.asarray(z["origin"]),
        voxel_size=jnp.float32(z["voxel_size"]),
        trunc=jnp.float32(z["trunc"]),
    )
