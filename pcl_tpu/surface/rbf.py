"""Marching-cubes RBF reconstruction.

Capability match for pcl::MarchingCubesRBF (reference: surface/include/pcl/
surface/marching_cubes_rbf.h): implicit function from a radial-basis-
function interpolant with off-surface constraints — for every (subsampled)
point two extra constraints at p ± eps*n with values ∓eps, kernel
phi(r) = r^3 (triharmonic, as the reference uses). The dense symmetric
solve and the grid evaluation are single batched jax ops (MXU matmuls);
meshing reuses surface nets.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pcl_tpu.core.cloud import Cloud, ATTR_NORMAL
from pcl_tpu.surface.reconstruction import surface_nets


@partial(jax.jit, static_argnames=("resolution",))
def _rbf_field(centers, values, grid_min, grid_max, resolution):
    def phi(r2):
        return jnp.power(jnp.maximum(r2, 1e-20), 1.5)  # r^3

    d2 = jnp.sum(
        (centers[:, None, :] - centers[None, :, :]) ** 2, -1
    )
    A = phi(d2) + 1e-6 * jnp.eye(centers.shape[0])
    w = jnp.linalg.solve(A, values)

    R = resolution
    lin = [jnp.linspace(grid_min[i], grid_max[i], R) for i in range(3)]
    gx, gy, gz = jnp.meshgrid(*lin, indexing="ij")
    q = jnp.stack([gx, gy, gz], -1).reshape(-1, 3)
    qd2 = jnp.sum((q[:, None, :] - centers[None, :, :]) ** 2, -1)
    f = phi(qd2) @ w
    return f.reshape(R, R, R)


def marching_cubes_rbf(
    cloud: Cloud,
    resolution: int = 32,
    off_surface_epsilon: float = 0.05,
    max_centers: int = 300,
    padding: float = 0.15,
    seed: int = 0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (vertices, triangles). ``off_surface_epsilon`` mirrors
    setOffSurfaceDisplacement; the RBF system is built from at most
    ``max_centers`` subsampled points x3 constraints (O(M^2) solve)."""
    if ATTR_NORMAL not in cloud.attrs:
        raise ValueError("marching_cubes_rbf requires normals")
    xyz = np.asarray(cloud.xyz)
    m = np.asarray(cloud.mask)
    n = np.asarray(cloud.attrs[ATTR_NORMAL])
    pts = xyz[m]
    nn = n[m]
    if len(pts) > max_centers:
        rng = np.random.default_rng(seed)
        sel = rng.choice(len(pts), max_centers, replace=False)
        pts, nn = pts[sel], nn[sel]

    eps = off_surface_epsilon
    centers = np.concatenate([pts, pts + eps * nn, pts - eps * nn])
    values = np.concatenate(
        [np.zeros(len(pts)), -eps * np.ones(len(pts)), eps * np.ones(len(pts))]
    )

    lo, hi = pts.min(0), pts.max(0)
    span = hi - lo + 1e-9
    gmin = (lo - padding * span).astype(np.float32)
    gmax = (hi + padding * span).astype(np.float32)

    field = np.asarray(
        _rbf_field(
            jnp.asarray(centers, jnp.float32),
            jnp.asarray(values, jnp.float32),
            jnp.asarray(gmin),
            jnp.asarray(gmax),
            resolution,
        )
    )
    return surface_nets(field, gmin, gmax)
