"""B-spline surface fitting (reference:
examples/surface/example_nurbs_fitting_surface.cpp — here via the
surface.bspline capability slice instead of opennurbs)."""
import numpy as np
import jax.numpy as jnp
from pcl_tpu.core.cloud import from_numpy
from pcl_tpu.surface import fit_bspline_surface, eval_bspline_surface

rng = np.random.default_rng(0)
xy = rng.uniform(-1, 1, size=(3000, 2)).astype(np.float32)
z = 0.3 * np.sin(2 * xy[:, 0]) * np.cos(2 * xy[:, 1])
cloud = from_numpy(np.column_stack([xy, z]).astype(np.float32))
surf = fit_bspline_surface(cloud, grid_u=12, grid_v=12)
g = np.linspace(0.1, 0.9, 10)
uu, vv = np.meshgrid(g, g)
uv = jnp.asarray(np.column_stack([uu.ravel(), vv.ravel()]), jnp.float32)
pts = np.asarray(eval_bspline_surface(surf, uv))
err = np.abs(pts[:, 2] - 0.3 * np.sin(2 * pts[:, 0]) * np.cos(2 * pts[:, 1]))
print("surface eval points:", len(pts), "median |dz|:", float(np.median(err)))
