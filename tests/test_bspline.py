"""B-spline surface/curve fitting (the NURBS capability slice, reference
surface/on_nurbs fitting examples)."""

import numpy as np
import jax.numpy as jnp

from pcl_tpu.core.cloud import from_numpy
from pcl_tpu.surface.bspline import (
    fit_bspline_surface, eval_bspline_surface,
    fit_bspline_curve2d, eval_bspline_curve2d,
)


class TestSurfaceFit:
    def test_recovers_smooth_height_field(self, rng):
        n = 4000
        xy = rng.uniform(-1, 1, size=(n, 2)).astype(np.float32)
        z = 0.3 * np.sin(2 * xy[:, 0]) * np.cos(2 * xy[:, 1])
        pts = np.column_stack([xy, z]).astype(np.float32)
        noisy = pts + rng.normal(scale=0.01, size=pts.shape).astype(np.float32)
        surf = fit_bspline_surface(from_numpy(noisy), grid_u=12, grid_v=12,
                                   smoothness=1e-4)
        # evaluate on a dense grid; compare against the analytic surface
        g = np.linspace(0.05, 0.95, 20)
        uu, vv = np.meshgrid(g, g)
        uv = jnp.asarray(np.column_stack([uu.ravel(), vv.ravel()]),
                         jnp.float32)
        out = np.asarray(eval_bspline_surface(surf, uv))
        z_true = 0.3 * np.sin(2 * out[:, 0]) * np.cos(2 * out[:, 1])
        err = np.abs(out[:, 2] - z_true)
        assert np.median(err) < 0.02, np.median(err)
        assert err.max() < 0.12, err.max()

    def test_frame_invariance(self, rng):
        """Fitting a rotated cloud reconstructs the rotated surface: the
        local PCA frame absorbs the pose."""
        from scipy.spatial.transform import Rotation
        n = 3000
        xy = rng.uniform(-1, 1, size=(n, 2)).astype(np.float32)
        z = 0.2 * (xy[:, 0] ** 2 - xy[:, 1] ** 2)
        pts = np.column_stack([xy, z]).astype(np.float32)
        R = Rotation.from_rotvec([0.4, -0.3, 0.2]).as_matrix().astype(np.float32)
        t = np.float32([1.0, -2.0, 0.5])
        moved = pts @ R.T + t
        surf = fit_bspline_surface(from_numpy(moved), grid_u=10, grid_v=10)
        g = np.linspace(0.1, 0.9, 15)
        uu, vv = np.meshgrid(g, g)
        uv = jnp.asarray(np.column_stack([uu.ravel(), vv.ravel()]), jnp.float32)
        out = np.asarray(eval_bspline_surface(surf, uv))
        # every evaluated point lies near the true (moved) surface
        back = (out - t) @ R
        z_true = 0.2 * (back[:, 0] ** 2 - back[:, 1] ** 2)
        assert np.median(np.abs(back[:, 2] - z_true)) < 0.02


class TestCurveFit:
    def test_closed_curve_ellipse(self, rng):
        n = 800
        th = rng.uniform(0, 2 * np.pi, n)
        pts = np.column_stack([2.0 * np.cos(th), 1.0 * np.sin(th)])
        pts = (pts + rng.normal(scale=0.02, size=pts.shape)).astype(np.float32)
        curve = fit_bspline_curve2d(jnp.asarray(pts), jnp.ones(n, bool),
                                    n_control=16, smoothness=1e-3)
        t = jnp.asarray(np.linspace(0, 1, 200, endpoint=False), jnp.float32)
        out = np.asarray(eval_bspline_curve2d(curve, t))
        # evaluated points lie on the ellipse: (x/2)^2 + y^2 ~ 1
        q = (out[:, 0] / 2.0) ** 2 + out[:, 1] ** 2
        assert np.abs(q - 1.0).mean() < 0.05, np.abs(q - 1.0).mean()
        # closed: evaluation at t=0 and t->1 meet
        a = np.asarray(eval_bspline_curve2d(curve, jnp.asarray([0.0])))
        b = np.asarray(eval_bspline_curve2d(curve, jnp.asarray([0.999])))
        assert np.linalg.norm(a - b) < 0.1
