"""Closed 3-D B-spline curve fitting (reference:
examples/surface/example_nurbs_fitting_closed_curve3d.cpp)."""
import numpy as np
import jax.numpy as jnp
from pcl_tpu.surface import fit_bspline_curve3d, eval_bspline_curve3d

rng = np.random.default_rng(0)
th = rng.uniform(0, 2 * np.pi, 800)
# tilted warped ring in 3D + noise
pts = np.column_stack([
    2.0 * np.cos(th), np.sin(th), 0.3 * np.sin(2 * th)
]).astype(np.float32)
R = np.float32([[0.9363, -0.2751, 0.2184],
                [0.2896, 0.9561, -0.0370],
                [-0.1987, 0.0978, 0.9752]])
pts = pts @ R.T + rng.normal(0, 0.01, pts.shape).astype(np.float32)

curve = fit_bspline_curve3d(jnp.asarray(pts), jnp.ones(len(pts), bool),
                            n_control=16)
t = jnp.asarray(np.linspace(0, 1, 200, endpoint=False), jnp.float32)
out = np.asarray(eval_bspline_curve3d(curve, t))
# distance of curve samples back to the data
from scipy.spatial import cKDTree
d, _ = cKDTree(pts).query(out)
print("closed 3D curve fit, mean curve->data distance:", float(d.mean()))
