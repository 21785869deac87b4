"""Range images — spherical / planar 2.5D projections of clouds.

TPU-native equivalent of pcl::RangeImage / RangeImagePlanar (reference:
common/include/pcl/range_image/range_image.h:54,145 createFromPointCloud;
range_image_planar.h). The per-point z-buffer insertion loop becomes one
segment_min scatter; unprojection is a pure elementwise map. The image is a
fixed [H, W] f32 range array with -inf = unobserved (PCL uses -inf for
unobserved and +inf for far ranges as well).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from pcl_tpu.core.cloud import Cloud, make_cloud

_UNSEEN = -jnp.inf


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class RangeImage:
    ranges: jax.Array        # [H, W] f32; -inf where unobserved
    angular_res: jax.Array   # scalar f32 (spherical) or focal length (planar)
    center: jax.Array        # [2] f32 image center (cx, cy)
    sensor_pose: jax.Array   # [4,4] sensor-to-world
    planar: bool             # static

    def tree_flatten(self):
        return (self.ranges, self.angular_res, self.center, self.sensor_pose), (self.planar,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        ranges, angular_res, center, sensor_pose = children
        return cls(ranges, angular_res, center, sensor_pose, aux[0])

    @property
    def shape(self):
        return self.ranges.shape


@partial(jax.jit, static_argnames=("width", "height"))
def create_from_cloud(
    cloud: Cloud,
    angular_resolution: float = 0.5 * jnp.pi / 180.0,
    width: int = 720,
    height: int = 360,
    sensor_pose: Optional[jax.Array] = None,
) -> RangeImage:
    """Spherical projection with z-buffering (reference
    createFromPointCloud). Azimuth spans [-pi, pi) over ``width``; elevation
    [-pi/2, pi/2) over ``height`` at ``angular_resolution`` around the
    image center."""
    if sensor_pose is None:
        sensor_pose = jnp.eye(4, dtype=jnp.float32)
    world_to_sensor = jnp.linalg.inv(sensor_pose)
    p = cloud.xyz @ world_to_sensor[:3, :3].T + world_to_sensor[:3, 3]
    rng = jnp.linalg.norm(p, axis=-1)
    azimuth = jnp.arctan2(p[:, 0], p[:, 2])
    elevation = jnp.arcsin(jnp.where(rng > 0, p[:, 1] / jnp.maximum(rng, 1e-12), 0.0))
    cx, cy = width / 2.0, height / 2.0
    u = jnp.floor(azimuth / angular_resolution + cx).astype(jnp.int32)
    v = jnp.floor(elevation / angular_resolution + cy).astype(jnp.int32)
    inb = cloud.mask & (u >= 0) & (u < width) & (v >= 0) & (v < height) & (rng > 0)
    flat = jnp.where(inb, v * width + u, width * height)
    img = jax.ops.segment_min(
        jnp.where(inb, rng, jnp.inf), flat, num_segments=width * height + 1
    )[:-1]
    img = jnp.where(jnp.isfinite(img), img, _UNSEEN)
    return RangeImage(
        ranges=img.reshape(height, width),
        angular_res=jnp.float32(angular_resolution),
        center=jnp.asarray([cx, cy], jnp.float32),
        sensor_pose=sensor_pose.astype(jnp.float32),
        planar=False,
    )


@partial(jax.jit, static_argnames=("width", "height"))
def create_planar_from_cloud(
    cloud: Cloud,
    focal_length: float,
    width: int,
    height: int,
    sensor_pose: Optional[jax.Array] = None,
) -> RangeImage:
    """Pinhole projection (reference range_image_planar.h — depth-camera
    model: u = fx * x/z + cx)."""
    if sensor_pose is None:
        sensor_pose = jnp.eye(4, dtype=jnp.float32)
    world_to_sensor = jnp.linalg.inv(sensor_pose)
    p = cloud.xyz @ world_to_sensor[:3, :3].T + world_to_sensor[:3, 3]
    z = p[:, 2]
    cx, cy = width / 2.0, height / 2.0
    u = jnp.floor(focal_length * p[:, 0] / jnp.maximum(z, 1e-12) + cx).astype(jnp.int32)
    v = jnp.floor(focal_length * p[:, 1] / jnp.maximum(z, 1e-12) + cy).astype(jnp.int32)
    rng = jnp.linalg.norm(p, axis=-1)
    inb = cloud.mask & (z > 0) & (u >= 0) & (u < width) & (v >= 0) & (v < height)
    flat = jnp.where(inb, v * width + u, width * height)
    img = jax.ops.segment_min(
        jnp.where(inb, rng, jnp.inf), flat, num_segments=width * height + 1
    )[:-1]
    img = jnp.where(jnp.isfinite(img), img, _UNSEEN)
    return RangeImage(
        ranges=img.reshape(height, width),
        angular_res=jnp.float32(focal_length),
        center=jnp.asarray([cx, cy], jnp.float32),
        sensor_pose=sensor_pose.astype(jnp.float32),
        planar=True,
    )


@jax.jit
def to_cloud(ri: RangeImage) -> Cloud:
    """Unproject every observed pixel back to a world-frame point
    (reference calculate3DPoint / getPoint)."""
    H, W = ri.ranges.shape
    v, u = jnp.meshgrid(jnp.arange(H), jnp.arange(W), indexing="ij")
    r = ri.ranges.reshape(-1)
    uu = u.reshape(-1).astype(jnp.float32)
    vv = v.reshape(-1).astype(jnp.float32)
    observed = jnp.isfinite(r) & (r > 0)
    if ri.planar:
        f = ri.angular_res
        x_over_z = (uu + 0.5 - ri.center[0]) / f
        y_over_z = (vv + 0.5 - ri.center[1]) / f
        denom = jnp.sqrt(1.0 + x_over_z**2 + y_over_z**2)
        z = r / denom
        p = jnp.stack([x_over_z * z, y_over_z * z, z], axis=-1)
    else:
        az = (uu + 0.5 - ri.center[0]) * ri.angular_res
        el = (vv + 0.5 - ri.center[1]) * ri.angular_res
        ce = jnp.cos(el)
        p = jnp.stack(
            [r * ce * jnp.sin(az), r * jnp.sin(el), r * ce * jnp.cos(az)], axis=-1
        )
    pw = p @ ri.sensor_pose[:3, :3].T + ri.sensor_pose[:3, 3]
    return make_cloud(jnp.where(observed[:, None], pw, 0.0), observed,
                      width=W, height=H)
