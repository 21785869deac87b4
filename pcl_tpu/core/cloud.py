"""The Cloud pytree — pcl_tpu's core data model.

TPU-native replacement for ``pcl::PointCloud<PointT>`` (reference:
common/include/pcl/point_cloud.h:173). Instead of an AoS vector of typed
point structs, a :class:`Cloud` is a pytree of fixed-size padded arrays:

- ``xyz``:   ``[capacity, 3] float32`` point positions (padding rows are 0).
- ``mask``:  ``[capacity] bool`` validity mask — the XLA-static-shape answer
  to PCL's dynamic ``points.size()`` / ``is_dense`` NaN handling.
- ``attrs``: dict of named per-point attribute arrays ``[capacity, ...]``
  (normals, rgb, intensity, curvature, labels, descriptor rows...). This
  replaces PCL's ~50 compile-time point types (reference:
  common/include/pcl/impl/point_types.hpp:315-2030) with runtime composition:
  PointXYZRGBNormal is simply a Cloud with ``normal``/``rgb`` attrs.
- ``width/height``: static ints carried as aux data for organized clouds
  (reference: point_cloud.h:154-166). ``height==1`` means unorganized.

Being a pytree, a Cloud flows through jit/vmap/shard_map/scan unchanged; all
algorithms in pcl_tpu are pure functions ``Cloud -> Cloud`` rather than
stateful setX()/compute() objects (reference: common/include/pcl/pcl_base.h:69).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Standard attribute names (informal schema).
ATTR_NORMAL = "normal"          # [N, 3] f32
ATTR_CURVATURE = "curvature"    # [N] f32
ATTR_RGB = "rgb"                # [N, 3] f32 in [0, 1]
ATTR_INTENSITY = "intensity"    # [N] f32
ATTR_LABEL = "label"            # [N] i32


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class Cloud:
    """Fixed-capacity padded point cloud.

    ``xyz[i]`` is meaningful iff ``mask[i]``. Padding rows are zeros so that
    masked reductions can use plain sums. Attribute arrays share the leading
    ``capacity`` dimension.
    """

    xyz: jax.Array                      # [capacity, 3] float32
    mask: jax.Array                     # [capacity] bool
    attrs: Dict[str, jax.Array] = dataclasses.field(default_factory=dict)
    width: int = 0                      # static; 0 = unorganized (width=count unknown)
    height: int = 1                     # static; 1 = unorganized

    # ---- pytree protocol ------------------------------------------------
    def tree_flatten(self):
        keys = tuple(sorted(self.attrs.keys()))
        children = (self.xyz, self.mask) + tuple(self.attrs[k] for k in keys)
        aux = (keys, self.width, self.height)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        keys, width, height = aux
        xyz, mask = children[0], children[1]
        attrs = dict(zip(keys, children[2:]))
        return cls(xyz=xyz, mask=mask, attrs=attrs, width=width, height=height)

    # ---- basic properties ----------------------------------------------
    @property
    def capacity(self) -> int:
        return self.xyz.shape[0]

    @property
    def count(self) -> jax.Array:
        """Number of valid points (traced scalar)."""
        return jnp.sum(self.mask.astype(jnp.int32))

    @property
    def is_organized(self) -> bool:
        return self.height > 1

    def has(self, name: str) -> bool:
        return name in self.attrs

    # ---- functional updates ---------------------------------------------
    def with_attrs(self, **new_attrs: jax.Array) -> "Cloud":
        attrs = dict(self.attrs)
        attrs.update(new_attrs)
        return dataclasses.replace(self, attrs=attrs)

    def without_attrs(self, *names: str) -> "Cloud":
        attrs = {k: v for k, v in self.attrs.items() if k not in names}
        return dataclasses.replace(self, attrs=attrs)

    def with_xyz(self, xyz: jax.Array) -> "Cloud":
        return dataclasses.replace(self, xyz=xyz)

    def with_mask(self, mask: jax.Array) -> "Cloud":
        """Intersect validity with ``mask`` and zero out newly-dead rows."""
        new_mask = jnp.logical_and(self.mask, mask)
        return dataclasses.replace(
            self,
            xyz=jnp.where(new_mask[:, None], self.xyz, 0.0),
            mask=new_mask,
        )

    def take(self, indices: jax.Array, valid: Optional[jax.Array] = None) -> "Cloud":
        """Gather rows by index, producing a new cloud of len(indices) capacity.

        ``valid`` marks which gathered rows are real (defaults to the source
        mask at those indices). Out-of-range/padding indices must be clipped
        by the caller or covered by ``valid``.
        """
        idx = jnp.clip(indices, 0, self.capacity - 1)
        m = self.mask[idx]
        if valid is not None:
            m = jnp.logical_and(m, valid)
        xyz = jnp.where(m[:, None], self.xyz[idx], 0.0)
        attrs = {}
        for k, v in self.attrs.items():
            g = v[idx]
            mm = m.reshape((-1,) + (1,) * (g.ndim - 1))
            attrs[k] = jnp.where(mm, g, jnp.zeros_like(g))
        return Cloud(xyz=xyz, mask=m, attrs=attrs, width=0, height=1)

    def pad_to(self, capacity: int) -> "Cloud":
        """Grow (or assert) capacity; padding rows invalid."""
        cap = self.capacity
        if capacity < cap:
            raise ValueError(f"pad_to({capacity}) smaller than capacity {cap}")
        if capacity == cap:
            return self
        extra = capacity - cap
        xyz = jnp.concatenate([self.xyz, jnp.zeros((extra, 3), self.xyz.dtype)])
        mask = jnp.concatenate([self.mask, jnp.zeros((extra,), bool)])
        attrs = {
            k: jnp.concatenate([v, jnp.zeros((extra,) + v.shape[1:], v.dtype)])
            for k, v in self.attrs.items()
        }
        return Cloud(xyz=xyz, mask=mask, attrs=attrs, width=self.width, height=self.height)


# ---------------------------------------------------------------------------
# Constructors
# ---------------------------------------------------------------------------

def make_cloud(
    xyz: jax.Array,
    mask: Optional[jax.Array] = None,
    attrs: Optional[Dict[str, jax.Array]] = None,
    capacity: Optional[int] = None,
    width: int = 0,
    height: int = 1,
) -> Cloud:
    """Build a Cloud from an ``[N, 3]`` array, optionally padding to capacity."""
    xyz = jnp.asarray(xyz, jnp.float32)
    n = xyz.shape[0]
    if mask is None:
        mask = jnp.ones((n,), bool)
    else:
        mask = jnp.asarray(mask, bool)
    cloud = Cloud(
        xyz=jnp.where(mask[:, None], xyz, 0.0),
        mask=mask,
        attrs=dict(attrs or {}),
        width=width,
        height=height,
    )
    if capacity is not None:
        cloud = cloud.pad_to(capacity)
    return cloud


def from_numpy(
    xyz: np.ndarray,
    attrs: Optional[Dict[str, np.ndarray]] = None,
    capacity: Optional[int] = None,
    drop_nonfinite: bool = True,
    width: int = 0,
    height: int = 1,
) -> Cloud:
    """Host-side constructor. Non-finite points (PCL's ``is_dense=false`` NaNs,
    reference: point_cloud.h:166) become masked-out padding instead of being
    carried as NaN."""
    xyz = np.asarray(xyz, np.float32)
    mask = np.isfinite(xyz).all(axis=1) if drop_nonfinite else np.ones(len(xyz), bool)
    xyz = np.where(mask[:, None], xyz, 0.0)
    jattrs = {}
    for k, v in (attrs or {}).items():
        v = np.asarray(v)
        if v.dtype == np.float64:
            v = v.astype(np.float32)
        if drop_nonfinite and np.issubdtype(v.dtype, np.floating):
            vm = v.reshape(len(v), -1)
            v = np.where(
                mask.reshape((-1,) + (1,) * (v.ndim - 1)), v, np.zeros_like(v)
            )
            del vm
        jattrs[k] = jnp.asarray(v)
    return make_cloud(jnp.asarray(xyz), jnp.asarray(mask), jattrs,
                      capacity=capacity, width=width, height=height)


def to_numpy(cloud: Cloud, compact: bool = True) -> Tuple[np.ndarray, Dict[str, np.ndarray]]:
    """Return (xyz, attrs) as numpy; if ``compact``, drop padding rows."""
    xyz = np.asarray(cloud.xyz)
    mask = np.asarray(cloud.mask)
    attrs = {k: np.asarray(v) for k, v in cloud.attrs.items()}
    if compact:
        xyz = xyz[mask]
        attrs = {k: v[mask] for k, v in attrs.items()}
    return xyz, attrs


def concat(a: Cloud, b: Cloud) -> Cloud:
    """Cloud concatenation (reference: point_cloud.h operator+= :242-266)."""
    keys = set(a.attrs) | set(b.attrs)

    def get(c: Cloud, k: str) -> jax.Array:
        if k in c.attrs:
            return c.attrs[k]
        other = (b if c is a else a).attrs[k]
        return jnp.zeros((c.capacity,) + other.shape[1:], other.dtype)

    return Cloud(
        xyz=jnp.concatenate([a.xyz, b.xyz]),
        mask=jnp.concatenate([a.mask, b.mask]),
        attrs={k: jnp.concatenate([get(a, k), get(b, k)]) for k in keys},
        width=0,
        height=1,
    )


def compact_indices(mask: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Stable front-compaction permutation for a validity mask.

    Returns ``(perm, count)`` where ``perm`` lists valid indices first (in
    order) then invalid ones. This is the static-shape equivalent of PCL's
    ``removeNaNFromPointCloud`` / ``ExtractIndices``.
    """
    n = mask.shape[0]
    order = jnp.argsort(jnp.where(mask, 0, 1), stable=True)
    return order, jnp.sum(mask.astype(jnp.int32))


def compact(cloud: Cloud) -> Cloud:
    """Move valid points to the front (capacity unchanged)."""
    perm, _ = compact_indices(cloud.mask)
    return cloud.take(perm)
