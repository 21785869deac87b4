"""2-D B-spline curve fitting on the shipped curve fixture (reference:
examples/surface/example_nurbs_fitting_curve2d.cpp with
test/curve2d.pcd). Falls back to a synthetic curve when the fixture is
absent."""
import os
import numpy as np
import jax.numpy as jnp
from pcl_tpu.surface import fit_bspline_curve2d, eval_bspline_curve2d

path = os.environ.get("PCL_TPU_REF_DATA", "/root/reference/test")
fix = os.path.join(path, "curve2d.pcd")
if os.path.exists(fix):
    from pcl_tpu.io import pcd as pcd_io
    c = pcd_io.load(fix)
    pts = np.asarray(c.xyz)[np.asarray(c.mask)][:, :2].astype(np.float32)
else:
    th = np.linspace(0, 2 * np.pi, 400, endpoint=False)
    pts = np.column_stack([np.cos(th) * (1 + 0.3 * np.cos(3 * th)),
                           np.sin(th) * (1 + 0.3 * np.cos(3 * th))]
                          ).astype(np.float32)
curve = fit_bspline_curve2d(jnp.asarray(pts), jnp.ones(len(pts), bool),
                            n_control=24)
t = jnp.asarray(np.linspace(0, 1, 200, endpoint=False), jnp.float32)
out = np.asarray(eval_bspline_curve2d(curve, t))
from scipy.spatial import cKDTree
d, _ = cKDTree(pts).query(out)
print("curve2d fit, mean curve->data distance:", float(d.mean()))
