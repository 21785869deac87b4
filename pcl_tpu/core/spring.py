"""Organized-cloud border expansion — pcl::common "spring" operations.

Equivalent of common/include/pcl/common/spring.h: grow or shrink an
organized cloud by whole rows/columns, with the new border filled by a
constant point (expand*), by duplicating the edge row/column
(duplicate*), or by mirroring (mirror*); delete* removes border
rows/columns. All operate on the ``[H, W]``-shaped view of a Cloud and
return a new organized Cloud (attrs ride along; the fill value applies
to xyz, attrs get zeros on expanded borders).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from pcl_tpu.core.cloud import Cloud


def _grid(cloud: Cloud):
    h, w = cloud.height, cloud.width
    if h <= 0 or w <= 0 or h * w != cloud.capacity:
        raise ValueError("spring ops require an organized cloud")
    return h, w


def _rebuild(cloud: Cloud, xyz, mask, attrs, h, w) -> Cloud:
    return Cloud(xyz=xyz.reshape(-1, 3), mask=mask.reshape(-1),
                 attrs={k: v.reshape((-1,) + v.shape[2:])
                        for k, v in attrs.items()},
                 width=w, height=h)


def _pad(cloud: Cloud, amount: int, axis: int, mode: str,
         fill: Optional[jax.Array] = None) -> Cloud:
    h, w = _grid(cloud)
    xyz = cloud.xyz.reshape(h, w, 3)
    mask = cloud.mask.reshape(h, w)
    attrs = {k: v.reshape((h, w) + v.shape[1:]) for k, v in cloud.attrs.items()}
    pad = [(0, 0)] * xyz.ndim
    pad[axis] = (amount, amount)

    if mode == "constant":
        f = jnp.zeros((3,), jnp.float32) if fill is None else jnp.asarray(fill)
        xyz2 = jnp.pad(xyz, pad[:3])
        # overwrite padded xyz with the fill point
        idx = [slice(None)] * 3
        idx[axis] = slice(0, amount)
        xyz2 = xyz2.at[tuple(idx)].set(f)
        idx[axis] = slice(xyz2.shape[axis] - amount, xyz2.shape[axis])
        xyz2 = xyz2.at[tuple(idx)].set(f)
        mask2 = jnp.pad(mask, pad[:2], constant_values=True)
        attrs2 = {k: jnp.pad(v, pad[:v.ndim]) for k, v in attrs.items()}
    else:  # "edge" (duplicate) or "reflect" (mirror)
        np_mode = "edge" if mode == "edge" else "symmetric"
        xyz2 = jnp.pad(xyz, pad[:3], mode=np_mode)
        mask2 = jnp.pad(mask, pad[:2], mode=np_mode)
        attrs2 = {k: jnp.pad(v, pad[:v.ndim], mode=np_mode)
                  for k, v in attrs.items()}
    h2 = h + 2 * amount if axis == 0 else h
    w2 = w + 2 * amount if axis == 1 else w
    return _rebuild(cloud, xyz2, mask2, attrs2, h2, w2)


def copy_make_border(cloud: Cloud, top: int, bottom: int, left: int,
                     right: int, policy: str = "constant",
                     value=None) -> Cloud:
    """Asymmetric border expansion (pcl::copyPointCloud borders,
    common/include/pcl/common/copy_point.h family — pinned by
    test/common/test_copy_make_borders.cpp): grow the organized cloud by
    (top, bottom) rows and (left, right) columns filled by ``policy``:
    'constant' (the fill ``value`` point), 'replicate' (edge), or
    'reflect' (mirror)."""
    h, w = _grid(cloud)
    xyz = cloud.xyz.reshape(h, w, 3)
    mask = cloud.mask.reshape(h, w)
    attrs = {k: v.reshape((h, w) + v.shape[1:])
             for k, v in cloud.attrs.items()}
    pw2 = ((top, bottom), (left, right))
    if policy == "constant":
        f = jnp.zeros((3,), jnp.float32) if value is None             else jnp.asarray(value, jnp.float32)
        xyz2 = jnp.pad(xyz, pw2 + ((0, 0),))
        h2, w2 = h + top + bottom, w + left + right
        border = jnp.ones((h2, w2), bool).at[
            top:top + h, left:left + w].set(False)
        xyz2 = jnp.where(border[..., None], f, xyz2)
        mask2 = jnp.pad(mask, pw2, constant_values=True)
        attrs2 = {k: jnp.pad(v, pw2 + ((0, 0),) * (v.ndim - 2))
                  for k, v in attrs.items()}
    elif policy in ("replicate", "reflect"):
        mode = "edge" if policy == "replicate" else "symmetric"
        xyz2 = jnp.pad(xyz, pw2 + ((0, 0),), mode=mode)
        mask2 = jnp.pad(mask, pw2, mode=mode)
        attrs2 = {k: jnp.pad(v, pw2 + ((0, 0),) * (v.ndim - 2), mode=mode)
                  for k, v in attrs.items()}
    else:
        raise ValueError(f"unknown border policy {policy!r}")
    return _rebuild(cloud, xyz2, mask2, attrs2,
                    h + top + bottom, w + left + right)


def expand_rows(cloud: Cloud, fill, amount: int) -> Cloud:
    """Add ``amount`` rows of the fill point on top and bottom
    (spring.h:57 expandRows)."""
    return _pad(cloud, amount, 0, "constant", fill)


def expand_columns(cloud: Cloud, fill, amount: int) -> Cloud:
    """Add ``amount`` columns of the fill point left and right
    (spring.h:69 expandColumns)."""
    return _pad(cloud, amount, 1, "constant", fill)


def duplicate_rows(cloud: Cloud, amount: int) -> Cloud:
    """Duplicate the top and bottom rows ``amount`` times (spring.h:78)."""
    return _pad(cloud, amount, 0, "edge")


def duplicate_columns(cloud: Cloud, amount: int) -> Cloud:
    """Duplicate the first and last columns ``amount`` times (spring.h:88)."""
    return _pad(cloud, amount, 1, "edge")


def mirror_rows(cloud: Cloud, amount: int) -> Cloud:
    """Mirror the top and bottom rows ``amount`` times (spring.h:97)."""
    return _pad(cloud, amount, 0, "reflect")


def mirror_columns(cloud: Cloud, amount: int) -> Cloud:
    """Mirror the first and last columns ``amount`` times (spring.h:106)."""
    return _pad(cloud, amount, 1, "reflect")


def delete_rows(cloud: Cloud, amount: int) -> Cloud:
    """Remove ``amount`` rows from top and bottom (spring.h:115)."""
    h, w = _grid(cloud)
    xyz = cloud.xyz.reshape(h, w, 3)[amount:h - amount]
    mask = cloud.mask.reshape(h, w)[amount:h - amount]
    attrs = {k: v.reshape((h, w) + v.shape[1:])[amount:h - amount]
             for k, v in cloud.attrs.items()}
    return _rebuild(cloud, xyz, mask, attrs, h - 2 * amount, w)


def delete_cols(cloud: Cloud, amount: int) -> Cloud:
    """Remove ``amount`` columns from left and right (spring.h:124)."""
    h, w = _grid(cloud)
    xyz = cloud.xyz.reshape(h, w, 3)[:, amount:w - amount]
    mask = cloud.mask.reshape(h, w)[:, amount:w - amount]
    attrs = {k: v.reshape((h, w) + v.shape[1:])[:, amount:w - amount]
             for k, v in cloud.attrs.items()}
    return _rebuild(cloud, xyz, mask, attrs, h, w - 2 * amount)
