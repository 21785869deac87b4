"""Closed B-spline curve fitting (reference:
examples/surface/example_nurbs_fitting_closed_curve.cpp)."""
import numpy as np
import jax.numpy as jnp
from pcl_tpu.surface import fit_bspline_curve2d, eval_bspline_curve2d

rng = np.random.default_rng(0)
th = rng.uniform(0, 2 * np.pi, 600)
pts = np.column_stack([2 * np.cos(th), np.sin(th)]).astype(np.float32)
curve = fit_bspline_curve2d(jnp.asarray(pts), jnp.ones(600, bool),
                            n_control=16)
t = jnp.asarray(np.linspace(0, 1, 100, endpoint=False), jnp.float32)
out = np.asarray(eval_bspline_curve2d(curve, t))
q = (out[:, 0] / 2) ** 2 + out[:, 1] ** 2
print("closed-curve fit, mean |radius error|:", float(np.abs(q - 1).mean()))
