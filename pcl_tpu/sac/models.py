"""Geometric SAC models — batched coefficient solvers + distance fields.

Equivalents of pcl::SampleConsensusModel* (reference: sample_consensus/
include/pcl/sample_consensus/sac_model_plane.h, sac_model_sphere.h,
sac_model_line.h, sac_model_circle3d.h, sac_model_cylinder.h,
sac_model_stick.h, sac_model_registration.h). Each model is a stateless
object with:

- ``sample_size``: points per minimal sample (static int)
- ``fit(samples [..., m, 3], normals or None) -> coeffs [..., C]``
  (vectorized minimal solver; degenerate samples yield NaN coeffs which
  score as -inf inliers)
- ``distances(coeffs [..., C], xyz [N, 3]) -> [..., N]`` point-to-model
  distance (same metric as the reference's getDistancesToModel)
- ``refine(coeffs, xyz, weights) -> coeffs`` least-squares refinement on
  inliers (optimizeModelCoefficients)
- ``project(coeffs, xyz) -> xyz`` projection onto the model where defined
  (projectPoints, used by ProjectInliers)

Coefficient layouts match the reference (e.g. plane = [nx,ny,nz,d] with
n.p + d = 0; sphere = [cx,cy,cz,r]).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from pcl_tpu.core import geometry

_EPS = 1e-12


def _unit(v, axis=-1):
    return v / jnp.maximum(jnp.linalg.norm(v, axis=axis, keepdims=True), _EPS)


class SacModel:
    sample_size: int = 3
    coeff_size: int = 4
    needs_normals: bool = False

    def fit(self, samples: jax.Array, normals: Optional[jax.Array] = None) -> jax.Array:
        raise NotImplementedError

    def distances(self, coeffs: jax.Array, xyz: jax.Array) -> jax.Array:
        raise NotImplementedError

    def refine(self, coeffs: jax.Array, xyz: jax.Array, weights: jax.Array) -> jax.Array:
        return coeffs

    def project(self, coeffs: jax.Array, xyz: jax.Array) -> jax.Array:
        raise NotImplementedError(f"{type(self).__name__} has no projection")


@dataclasses.dataclass(frozen=True)
class PlaneModel(SacModel):
    """[nx,ny,nz,d], unit normal, n.p + d = 0 (reference:
    sac_model_plane.h; point-to-plane distance |n.p + d|)."""
    sample_size: int = 3
    coeff_size: int = 4

    def fit(self, samples, normals=None):
        p0, p1, p2 = samples[..., 0, :], samples[..., 1, :], samples[..., 2, :]
        n = jnp.cross(p1 - p0, p2 - p0)
        nn = jnp.linalg.norm(n, axis=-1, keepdims=True)
        n = n / jnp.maximum(nn, _EPS)
        d = -jnp.sum(n * p0, axis=-1, keepdims=True)
        c = jnp.concatenate([n, d], axis=-1)
        # collinear sample -> invalid
        bad = nn[..., 0] < 1e-9
        return jnp.where(bad[..., None], jnp.nan, c)

    def distances(self, coeffs, xyz):
        n = coeffs[..., None, :3]
        d = coeffs[..., None, 3]
        return jnp.abs(jnp.sum(n * xyz, axis=-1) + d)

    def refine(self, coeffs, xyz, weights):
        # weighted plane fit: centroid + smallest eigenvector
        mu, cov, _ = geometry.mean_and_covariance(xyz, weights > 0, weights)
        n, _ = geometry.smallest_eigenvector33(cov)
        # keep orientation consistent with the input estimate
        flip = jnp.sum(n * coeffs[..., :3], axis=-1) < 0
        n = jnp.where(flip[..., None], -n, n)
        d = -jnp.sum(n * mu, axis=-1, keepdims=True)
        return jnp.concatenate([n, d], axis=-1)

    def project(self, coeffs, xyz):
        n = coeffs[..., None, :3]
        d = coeffs[..., None, 3]
        t = jnp.sum(n * xyz, axis=-1) + d
        return xyz - t[..., None] * n


@dataclasses.dataclass(frozen=True)
class LineModel(SacModel):
    """[px,py,pz, dx,dy,dz] point + unit direction (reference:
    sac_model_line.h; distance = perpendicular distance)."""
    sample_size: int = 2
    coeff_size: int = 6

    def fit(self, samples, normals=None):
        p0, p1 = samples[..., 0, :], samples[..., 1, :]
        d = p1 - p0
        nn = jnp.linalg.norm(d, axis=-1, keepdims=True)
        d = d / jnp.maximum(nn, _EPS)
        c = jnp.concatenate([p0, d], axis=-1)
        return jnp.where((nn[..., 0] < 1e-9)[..., None], jnp.nan, c)

    def distances(self, coeffs, xyz):
        p = coeffs[..., None, :3]
        d = coeffs[..., None, 3:6]
        r = xyz - p
        t = jnp.sum(r * d, axis=-1)
        perp = r - t[..., None] * d
        return jnp.linalg.norm(perp, axis=-1)

    def project(self, coeffs, xyz):
        p = coeffs[..., None, :3]
        d = coeffs[..., None, 3:6]
        t = jnp.sum((xyz - p) * d, axis=-1)
        return p + t[..., None] * d


@dataclasses.dataclass(frozen=True)
class StickModel(SacModel):
    """Line segment with endpoints from the sample (reference:
    sac_model_stick.h) — distance to the SEGMENT, not the infinite line."""
    sample_size: int = 2
    coeff_size: int = 6  # [p0, p1]

    def fit(self, samples, normals=None):
        p0, p1 = samples[..., 0, :], samples[..., 1, :]
        bad = jnp.linalg.norm(p1 - p0, axis=-1) < 1e-9
        c = jnp.concatenate([p0, p1], axis=-1)
        return jnp.where(bad[..., None], jnp.nan, c)

    def distances(self, coeffs, xyz):
        p0 = coeffs[..., None, :3]
        p1 = coeffs[..., None, 3:6]
        d = p1 - p0
        len2 = jnp.maximum(jnp.sum(d * d, axis=-1), _EPS)
        t = jnp.clip(jnp.sum((xyz - p0) * d, axis=-1) / len2, 0.0, 1.0)
        proj = p0 + t[..., None] * d
        return jnp.linalg.norm(xyz - proj, axis=-1)


@dataclasses.dataclass(frozen=True)
class SphereModel(SacModel):
    """[cx,cy,cz,r] (reference: sac_model_sphere.h; distance = |dist_to_c - r|).
    Minimal solve: 4 points -> linear system from the algebraic sphere form."""
    sample_size: int = 4
    coeff_size: int = 4
    radius_min: float = 0.0
    radius_max: float = float("inf")

    def fit(self, samples, normals=None):
        # |p|^2 = 2 c.p + (r^2 - |c|^2): solve A [2c; k] with A=[p, 1]
        p = samples
        A = jnp.concatenate([p, jnp.ones(p.shape[:-1] + (1,), p.dtype)], axis=-1)  # [...,4,4]
        b = jnp.sum(p * p, axis=-1)                                                # [...,4]
        det_ok = jnp.abs(jnp.linalg.det(A)) > 1e-9
        A_safe = jnp.where(det_ok[..., None, None], A, jnp.eye(4, dtype=A.dtype))
        x = jnp.linalg.solve(A_safe, b[..., None])[..., 0]
        c = 0.5 * x[..., :3]
        r2 = x[..., 3] + jnp.sum(c * c, axis=-1)
        r = jnp.sqrt(jnp.maximum(r2, 0.0))
        coeffs = jnp.concatenate([c, r[..., None]], axis=-1)
        # setRadiusLimits (sac_model.h:378 isModelValid): hypotheses with
        # out-of-range radius are rejected outright
        ok = det_ok & (r2 > 0) & (r >= self.radius_min) & (r <= self.radius_max)
        return jnp.where(ok[..., None], coeffs, jnp.nan)

    def distances(self, coeffs, xyz):
        c = coeffs[..., None, :3]
        r = coeffs[..., None, 3]
        return jnp.abs(jnp.linalg.norm(xyz - c, axis=-1) - r)

    def refine(self, coeffs, xyz, weights, iters: int = 3):
        """Gauss-Newton on (|p-c| - r); linear in r given c."""
        def step(carry, _):
            c, r = carry
            diff = xyz - c[..., None, :]
            dist = jnp.linalg.norm(diff, axis=-1)
            u = diff / jnp.maximum(dist, _EPS)[..., None]
            res = dist - r[..., None]
            w = weights
            # J = [-u, -1]; normal equations in (dc, dr)
            JtJ_cc = jnp.einsum("...n,...ni,...nj->...ij", w, u, u)
            JtJ_cr = jnp.einsum("...n,...ni->...i", w, u)
            n_w = jnp.sum(w, axis=-1)
            Jtr_c = jnp.einsum("...n,...ni->...i", w * res, u)
            Jtr_r = jnp.sum(w * res, axis=-1)
            H = jnp.zeros(c.shape[:-1] + (4, 4), c.dtype)
            H = H.at[..., :3, :3].set(JtJ_cc)
            H = H.at[..., :3, 3].set(JtJ_cr)
            H = H.at[..., 3, :3].set(JtJ_cr)
            H = H.at[..., 3, 3].set(n_w)
            g = jnp.concatenate([Jtr_c, Jtr_r[..., None]], axis=-1)
            H = H + 1e-9 * jnp.eye(4, dtype=c.dtype)
            dx = jnp.linalg.solve(H, g)
            return (c + dx[..., :3], r + dx[..., 3]), None

        c0, r0 = coeffs[..., :3], coeffs[..., 3]
        (c, r), _ = jax.lax.scan(step, (c0, r0), None, length=iters)
        return jnp.concatenate([c, r[..., None]], axis=-1)

    def project(self, coeffs, xyz):
        c = coeffs[..., None, :3]
        r = coeffs[..., None, 3:4]
        d = xyz - c
        return c + _unit(d) * r


@dataclasses.dataclass(frozen=True)
class CircleModel3D(SacModel):
    """[cx,cy,cz, r, nx,ny,nz] 3D circle (reference: sac_model_circle3d.h).
    Distance: Euclidean distance to the circle curve."""
    sample_size: int = 3
    coeff_size: int = 7

    def fit(self, samples, normals=None):
        p0, p1, p2 = samples[..., 0, :], samples[..., 1, :], samples[..., 2, :]
        # circumcenter of the triangle in its plane
        a = p1 - p0
        b = p2 - p0
        n = jnp.cross(a, b)
        n2 = jnp.sum(n * n, axis=-1, keepdims=True)
        bad = n2[..., 0] < 1e-12
        aa = jnp.sum(a * a, axis=-1, keepdims=True)
        bb = jnp.sum(b * b, axis=-1, keepdims=True)
        c_rel = jnp.cross(aa * b - bb * a, n) / jnp.maximum(2.0 * n2, _EPS)
        center = p0 + c_rel
        r = jnp.linalg.norm(c_rel, axis=-1, keepdims=True)
        nrm = n / jnp.maximum(jnp.sqrt(n2), _EPS)
        coeffs = jnp.concatenate([center, r, nrm], axis=-1)
        return jnp.where(bad[..., None], jnp.nan, coeffs)

    def distances(self, coeffs, xyz):
        c = coeffs[..., None, :3]
        r = coeffs[..., None, 3]
        n = coeffs[..., None, 4:7]
        d = xyz - c
        h = jnp.sum(d * n, axis=-1)                     # height over plane
        in_plane = d - h[..., None] * n
        rho = jnp.linalg.norm(in_plane, axis=-1)        # radial distance
        return jnp.sqrt((rho - r) ** 2 + h * h)


@dataclasses.dataclass(frozen=True)
class CylinderModel(SacModel):
    """[px,py,pz, dx,dy,dz, r] axis point/direction + radius (reference:
    sac_model_cylinder.h — minimal sample is 2 points WITH normals)."""
    sample_size: int = 2
    coeff_size: int = 7
    needs_normals: bool = True
    radius_min: float = 0.0
    radius_max: float = float("inf")

    def fit(self, samples, normals=None):
        if normals is None:
            raise ValueError("CylinderModel requires normals")
        p0, p1 = samples[..., 0, :], samples[..., 1, :]
        n0, n1 = normals[..., 0, :], normals[..., 1, :]
        # axis direction ~ n0 x n1 (both normals perpendicular to the axis)
        d = jnp.cross(n0, n1)
        dn = jnp.linalg.norm(d, axis=-1, keepdims=True)
        bad = dn[..., 0] < 1e-9                          # parallel normals
        d = d / jnp.maximum(dn, _EPS)
        # closest point between the two normal lines p0 + s n0, p1 + t n1
        # (reference solves the same two-line intersection)
        w0 = p0 - p1
        a_ = jnp.sum(n0 * n0, axis=-1); b_ = jnp.sum(n0 * n1, axis=-1)
        c_ = jnp.sum(n1 * n1, axis=-1)
        d_ = jnp.sum(n0 * w0, axis=-1); e_ = jnp.sum(n1 * w0, axis=-1)
        den = a_ * c_ - b_ * b_
        s = (b_ * e_ - c_ * d_) / jnp.maximum(den, _EPS)
        axis_pt = p0 + s[..., None] * n0
        # radius = distance of p0 to the axis
        r0 = p0 - axis_pt
        perp = r0 - jnp.sum(r0 * d, axis=-1, keepdims=True) * d
        r = jnp.linalg.norm(perp, axis=-1, keepdims=True)
        coeffs = jnp.concatenate([axis_pt, d, r], axis=-1)
        bad = bad | (den < 1e-12) | (r[..., 0] < self.radius_min) \
            | (r[..., 0] > self.radius_max)
        return jnp.where(bad[..., None], jnp.nan, coeffs)

    def distances(self, coeffs, xyz):
        p = coeffs[..., None, :3]
        d = coeffs[..., None, 3:6]
        r = coeffs[..., None, 6]
        rel = xyz - p
        t = jnp.sum(rel * d, axis=-1)
        perp = rel - t[..., None] * d
        return jnp.abs(jnp.linalg.norm(perp, axis=-1) - r)

    def project(self, coeffs, xyz):
        p = coeffs[..., None, :3]
        d = coeffs[..., None, 3:6]
        r = coeffs[..., None, 6:7]
        rel = xyz - p
        t = jnp.sum(rel * d, axis=-1)
        onaxis = p + t[..., None] * d
        radial = xyz - onaxis
        return onaxis + _unit(radial) * r


@dataclasses.dataclass(frozen=True)
class Circle2DModel(SacModel):
    """[cx, cy, r] circle in the z=0 projection (reference:
    sac_model_circle.h — operates on x/y, ignoring z)."""
    sample_size: int = 3
    coeff_size: int = 3
    radius_min: float = 0.0
    radius_max: float = float("inf")

    def fit(self, samples, normals=None):
        p = samples[..., :2]
        p0, p1, p2 = p[..., 0, :], p[..., 1, :], p[..., 2, :]
        # circumcenter in 2D: solve 2x2 linear system
        a = p1 - p0
        b = p2 - p0
        det = a[..., 0] * b[..., 1] - a[..., 1] * b[..., 0]
        bad = jnp.abs(det) < 1e-12
        aa = jnp.sum(a * a, axis=-1)
        bb = jnp.sum(b * b, axis=-1)
        ux = (b[..., 1] * aa - a[..., 1] * bb) / jnp.where(bad, 1.0, 2.0 * det)
        uy = (a[..., 0] * bb - b[..., 0] * aa) / jnp.where(bad, 1.0, 2.0 * det)
        c = p0 + jnp.stack([ux, uy], axis=-1)
        r = jnp.linalg.norm(c - p0, axis=-1)
        coeffs = jnp.concatenate([c, r[..., None]], axis=-1)
        bad = bad | (r < self.radius_min) | (r > self.radius_max)
        return jnp.where(bad[..., None], jnp.nan, coeffs)

    def distances(self, coeffs, xyz):
        c = coeffs[..., None, :2]
        r = coeffs[..., None, 2]
        return jnp.abs(jnp.linalg.norm(xyz[..., :2] - c, axis=-1) - r)

    def refine(self, coeffs, xyz, weights, iters: int = 3):
        def step(carry, _):
            c, r = carry
            diff = xyz[..., :2] - c[..., None, :]
            dist = jnp.linalg.norm(diff, axis=-1)
            u = diff / jnp.maximum(dist, _EPS)[..., None]
            res = dist - r[..., None]
            w = weights
            H = jnp.zeros(c.shape[:-1] + (3, 3), c.dtype)
            H = H.at[..., :2, :2].set(jnp.einsum("...n,...ni,...nj->...ij", w, u, u))
            cr = jnp.einsum("...n,...ni->...i", w, u)
            H = H.at[..., :2, 2].set(cr)
            H = H.at[..., 2, :2].set(cr)
            H = H.at[..., 2, 2].set(jnp.sum(w, axis=-1))
            g = jnp.concatenate(
                [jnp.einsum("...n,...ni->...i", w * res, u),
                 jnp.sum(w * res, axis=-1)[..., None]], axis=-1)
            dx = jnp.linalg.solve(H + 1e-9 * jnp.eye(3, dtype=c.dtype), g)
            return (c + dx[..., :2], r + dx[..., 2]), None

        (c, r), _ = jax.lax.scan(step, (coeffs[..., :2], coeffs[..., 2]), None, length=iters)
        return jnp.concatenate([c, r[..., None]], axis=-1)

    def project(self, coeffs, xyz):
        c = coeffs[..., None, :2]
        r = coeffs[..., None, 2:3]
        d2 = xyz[..., :2] - c
        p2 = c + _unit(d2) * r
        return jnp.concatenate([p2, xyz[..., 2:3] + jnp.zeros_like(p2[..., :1])], axis=-1)


@dataclasses.dataclass(frozen=True)
class ConeModel(SacModel):
    """[ax,ay,az, dx,dy,dz, alpha] apex + unit axis + half opening angle
    (reference: sac_model_cone.h — minimal sample is 3 points WITH normals).

    Fit: the tangent plane at each cone point passes through the apex
    (n_i . (p_i - A) = 0), so the apex solves the 3x3 system N A = N.p;
    the unit vectors u_i from the apex all make angle alpha with the axis,
    so (u_i - u_j) _|_ axis -> axis = cross of differences.
    """
    sample_size: int = 3
    coeff_size: int = 7
    needs_normals: bool = True

    def fit(self, samples, normals=None):
        if normals is None:
            raise ValueError("ConeModel requires normals")
        N = normals                                       # [..., 3, 3]
        b = jnp.sum(normals * samples, axis=-1)           # [..., 3]
        det_ok = jnp.abs(jnp.linalg.det(N)) > 1e-9
        N_safe = jnp.where(det_ok[..., None, None], N, jnp.eye(3, dtype=N.dtype))
        apex = jnp.linalg.solve(N_safe, b[..., None])[..., 0]
        u = _unit(samples - apex[..., None, :])           # [..., 3, 3]
        ax = jnp.cross(u[..., 0, :] - u[..., 1, :], u[..., 0, :] - u[..., 2, :])
        axn = jnp.linalg.norm(ax, axis=-1, keepdims=True)
        ax = ax / jnp.maximum(axn, _EPS)
        cosang = jnp.mean(jnp.sum(u * ax[..., None, :], axis=-1), axis=-1)
        # orient the axis from apex toward the points
        flip = cosang < 0
        ax = jnp.where(flip[..., None], -ax, ax)
        cosang = jnp.abs(cosang)
        alpha = jnp.arccos(jnp.clip(cosang, -1.0, 1.0))
        coeffs = jnp.concatenate([apex, ax, alpha[..., None]], axis=-1)
        bad = (~det_ok) | (axn[..., 0] < 1e-9) | (alpha < 1e-4) | (alpha > 1.5)
        return jnp.where(bad[..., None], jnp.nan, coeffs)

    def distances(self, coeffs, xyz):
        apex = coeffs[..., None, :3]
        ax = coeffs[..., None, 3:6]
        alpha = coeffs[..., None, 6]
        v = xyz - apex
        h = jnp.sum(v * ax, axis=-1)                       # height along axis
        rho = jnp.linalg.norm(v - h[..., None] * ax, axis=-1)
        # perpendicular distance to the surface line rho = h tan(alpha) in
        # the (h, rho) meridian half-plane (reference's point-to-cone metric)
        d_line = jnp.abs(rho * jnp.cos(alpha) - h * jnp.sin(alpha))
        d_apex = jnp.sqrt(h * h + rho * rho)
        # points "behind" the apex measure to the apex itself
        behind = (h * jnp.cos(alpha) + rho * jnp.sin(alpha)) < 0
        return jnp.where(behind, d_apex, d_line)


@dataclasses.dataclass(frozen=True)
class TorusModel(SacModel):
    """[R, r, cx,cy,cz, nx,ny,nz] major/minor radii + center + unit axis
    (reference: sac_model_torus.h — minimal sample is 4 points WITH normals).

    Fit: every torus surface normal line lies in a meridian plane and hence
    intersects the axis; the axis is recovered as the best-fit line through
    the pairwise closest-approach midpoints of the 4 normal lines, then the
    tube center circle gives (R, r, c) by least squares.
    """
    sample_size: int = 4
    coeff_size: int = 8
    needs_normals: bool = True

    @staticmethod
    def _pair_midpoints(p, n):
        """Closest-approach midpoints for all 6 pairs of the 4 normal lines."""
        pairs = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]
        mids, wts = [], []
        for i, j in pairs:
            p1, d1 = p[..., i, :], n[..., i, :]
            p2, d2 = p[..., j, :], n[..., j, :]
            w0 = p1 - p2
            a_ = jnp.sum(d1 * d1, axis=-1); b_ = jnp.sum(d1 * d2, axis=-1)
            c_ = jnp.sum(d2 * d2, axis=-1)
            d_ = jnp.sum(d1 * w0, axis=-1); e_ = jnp.sum(d2 * w0, axis=-1)
            den = a_ * c_ - b_ * b_
            ok = den > 1e-9
            den_s = jnp.where(ok, den, 1.0)
            s = (b_ * e_ - c_ * d_) / den_s
            t = (a_ * e_ - b_ * d_) / den_s
            q1 = p1 + s[..., None] * d1
            q2 = p2 + t[..., None] * d2
            mids.append(0.5 * (q1 + q2))
            wts.append(ok.astype(p.dtype))
        return jnp.stack(mids, axis=-2), jnp.stack(wts, axis=-1)  # [...,6,3], [...,6]

    def fit(self, samples, normals=None):
        if normals is None:
            raise ValueError("TorusModel requires normals")
        mids, w = self._pair_midpoints(samples, normals)
        wsum = jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), _EPS)
        mu = jnp.sum(mids * w[..., None], axis=-2) / wsum
        d = (mids - mu[..., None, :]) * w[..., None]
        cov = jnp.einsum("...ki,...kj->...ij", d, d)
        # axis = largest principal direction of the midpoints
        evals = geometry.eigvals33(cov)
        ax = geometry._eigvec(cov, evals[..., 2])
        ax = _unit(ax)
        # tube centers: c_i = p_i - r n_i must be at distance R from the axis
        # and at height ~0 in a common plane; solve r by 1D least squares so
        # the distances from (p_i - r n_i) to the axis have minimal variance.
        rel = samples - mu[..., None, :]
        h = jnp.sum(rel * ax[..., None, :], axis=-1)
        radial = rel - h[..., None] * ax[..., None, :]
        rho = jnp.linalg.norm(radial, axis=-1)            # [..., 4]
        u_rad = radial / jnp.maximum(rho, _EPS)[..., None]
        # derivative of rho w.r.t. moving along -n: drho/dr = -n . u_rad
        g = -jnp.sum(normals * u_rad, axis=-1)
        # minimize var(rho + r*g) over r: r = -cov(rho,g)/var(g)
        gm = g - jnp.mean(g, axis=-1, keepdims=True)
        rm = rho - jnp.mean(rho, axis=-1, keepdims=True)
        var_g = jnp.sum(gm * gm, axis=-1)
        r = -jnp.sum(rm * gm, axis=-1) / jnp.maximum(var_g, _EPS)
        centers = samples - r[..., None, None] * normals
        ch = jnp.sum((centers - mu[..., None, :]) * ax[..., None, :], axis=-1)
        center = mu + jnp.mean(ch, axis=-1)[..., None] * ax
        crel = centers - center[..., None, :]
        crad = crel - jnp.sum(crel * ax[..., None, :], axis=-1)[..., None] * ax[..., None, :]
        R = jnp.mean(jnp.linalg.norm(crad, axis=-1), axis=-1)
        r = jnp.abs(r)
        coeffs = jnp.concatenate(
            [R[..., None], r[..., None], center, ax], axis=-1)
        bad = (R < 1e-6) | (r < 1e-6) | (r > R)
        return jnp.where(bad[..., None], jnp.nan, coeffs)

    def distances(self, coeffs, xyz):
        R = coeffs[..., None, 0]
        r = coeffs[..., None, 1]
        c = coeffs[..., None, 2:5]
        ax = coeffs[..., None, 5:8]
        v = xyz - c
        h = jnp.sum(v * ax, axis=-1)
        rho = jnp.linalg.norm(v - h[..., None] * ax, axis=-1)
        return jnp.abs(jnp.sqrt((rho - R) ** 2 + h * h) - r)


@dataclasses.dataclass(frozen=True)
class Ellipse3DModel(SacModel):
    """[cx,cy,cz, a, b, nx,ny,nz, ux,uy,uz] center, semi-axes (a >= b),
    plane normal, major-axis direction (reference: sac_model_ellipse3d.h).

    Fit: PCA plane through the 6 sample points -> 2D conic least squares ->
    center/axes extraction. Distance: out-of-plane height combined with a
    Newton solve for the closest in-plane ellipse point.
    """
    sample_size: int = 6
    coeff_size: int = 11

    def fit(self, samples, normals=None):
        mu = jnp.mean(samples, axis=-2)
        d = samples - mu[..., None, :]
        cov = jnp.einsum("...ki,...kj->...ij", d, d)
        evals = geometry.eigvals33(cov)
        n = _unit(geometry._eigvec(cov, evals[..., 0]))
        e1 = _unit(geometry._eigvec(cov, evals[..., 2]))
        e2 = jnp.cross(n, e1)
        x = jnp.sum(d * e1[..., None, :], axis=-1)        # [..., 6]
        y = jnp.sum(d * e2[..., None, :], axis=-1)
        # conic a x^2 + b xy + c y^2 + d x + e y = 1 (6 pts, lstsq)
        A = jnp.stack([x * x, x * y, y * y, x, y], axis=-1)   # [..., 6, 5]
        ones = jnp.ones(x.shape, x.dtype)
        AtA = jnp.einsum("...ki,...kj->...ij", A, A)
        Atb = jnp.einsum("...ki,...k->...i", A, ones)
        sol = jnp.linalg.solve(AtA + 1e-9 * jnp.eye(5, dtype=A.dtype), Atb[..., None])[..., 0]
        ca, cb, cc, cd, ce = (sol[..., i] for i in range(5))
        det = 4 * ca * cc - cb * cb
        bad = det < 1e-12                                  # not an ellipse
        det_s = jnp.where(bad, 1.0, det)
        x0 = (cb * ce - 2 * cc * cd) / det_s
        y0 = (cb * cd - 2 * ca * ce) / det_s
        # constant at center: F0 = 1 + (a x0^2 + b x0 y0 + c y0^2 + d x0 + e y0) ...
        f0 = 1.0 + ca * x0 * x0 + cb * x0 * y0 + cc * y0 * y0 + cd * x0 + ce * y0 \
            - 2 * (ca * x0 * x0 + cc * y0 * y0) - cb * x0 * y0 - cd * x0 - ce * y0
        # cleaner: F(center) = a x0^2 + b x0 y0 + c y0^2 + d x0 + e y0 - 1
        fc = ca * x0 * x0 + cb * x0 * y0 + cc * y0 * y0 + cd * x0 + ce * y0 - 1.0
        del f0
        # eigen-decomposition of [[a, b/2], [b/2, c]]
        tr = ca + cc
        dq = jnp.sqrt(jnp.maximum((ca - cc) ** 2 + cb * cb, 0.0))
        l1 = 0.5 * (tr - dq)                               # minor curvature -> major axis
        l2 = 0.5 * (tr + dq)
        sa2 = -fc / jnp.where(jnp.abs(l1) < _EPS, 1.0, l1)
        sb2 = -fc / jnp.where(jnp.abs(l2) < _EPS, 1.0, l2)
        bad = bad | (sa2 <= 0) | (sb2 <= 0)
        sa = jnp.sqrt(jnp.maximum(sa2, _EPS))
        sb = jnp.sqrt(jnp.maximum(sb2, _EPS))
        # major-axis direction in-plane: eigenvector of the 2x2 for l1
        vx = jnp.where(jnp.abs(cb) > 1e-12, cb / 2.0, 1.0)
        vy = jnp.where(jnp.abs(cb) > 1e-12, l1 - ca, 0.0)
        vn = jnp.sqrt(vx * vx + vy * vy)
        vx, vy = vx / jnp.maximum(vn, _EPS), vy / jnp.maximum(vn, _EPS)
        u3 = vx[..., None] * e1 + vy[..., None] * e2
        center = mu + x0[..., None] * e1 + y0[..., None] * e2
        coeffs = jnp.concatenate(
            [center, sa[..., None], sb[..., None], n, u3], axis=-1)
        return jnp.where(bad[..., None], jnp.nan, coeffs)

    def distances(self, coeffs, xyz, newton_iters: int = 8):
        c = coeffs[..., None, :3]
        a = coeffs[..., None, 3]
        b = coeffs[..., None, 4]
        n = coeffs[..., None, 5:8]
        u = coeffs[..., None, 8:11]
        v = jnp.cross(n, u)
        rel = xyz - c
        h = jnp.sum(rel * n, axis=-1)
        px = jnp.sum(rel * u, axis=-1)
        py = jnp.sum(rel * v, axis=-1)
        # closest point on the ellipse (|px|,|py|) via Newton on the angle
        qx, qy = jnp.abs(px), jnp.abs(py)
        t = jnp.arctan2(a * qy, b * qx)

        def body(t, _):
            ct, st = jnp.cos(t), jnp.sin(t)
            ex, ey = a * ct, b * st
            # f(t) = (ex - qx)(-a st) + (ey - qy)(b ct)
            f = -(ex - qx) * a * st + (ey - qy) * b * ct
            fp = -(ex - qx) * a * ct + a * a * st * st \
                - (ey - qy) * b * st + b * b * ct * ct
            t = t - f / jnp.where(jnp.abs(fp) < _EPS, 1.0, fp)
            return jnp.clip(t, 0.0, jnp.pi / 2), None

        t, _ = jax.lax.scan(body, t, None, length=newton_iters)
        ex, ey = a * jnp.cos(t), b * jnp.sin(t)
        d_in = jnp.sqrt((ex - qx) ** 2 + (ey - qy) ** 2)
        return jnp.sqrt(d_in * d_in + h * h)


def _angle_between(v, axis):
    axis = axis / jnp.maximum(jnp.linalg.norm(axis), _EPS)
    cosang = jnp.abs(jnp.sum(v * axis, axis=-1))
    return jnp.arccos(jnp.clip(cosang, 0.0, 1.0))


@dataclasses.dataclass(frozen=True)
class PerpendicularPlaneModel(PlaneModel):
    """Plane whose normal is within eps_angle of ``axis`` (reference:
    sac_model_perpendicular_plane.h). Violating samples are invalidated."""
    axis: Tuple[float, float, float] = (0.0, 0.0, 1.0)
    eps_angle: float = 0.2

    def fit(self, samples, normals=None):
        c = PlaneModel.fit(self, samples, normals)
        ang = _angle_between(c[..., :3], jnp.asarray(self.axis, c.dtype))
        return jnp.where((ang > self.eps_angle)[..., None], jnp.nan, c)


@dataclasses.dataclass(frozen=True)
class ParallelPlaneModel(PlaneModel):
    """Plane PARALLEL to ``axis`` — i.e. normal perpendicular to it
    (reference: sac_model_parallel_plane.h)."""
    axis: Tuple[float, float, float] = (0.0, 0.0, 1.0)
    eps_angle: float = 0.2

    def fit(self, samples, normals=None):
        c = PlaneModel.fit(self, samples, normals)
        ang = _angle_between(c[..., :3], jnp.asarray(self.axis, c.dtype))
        bad = jnp.abs(ang - jnp.pi / 2) > self.eps_angle
        return jnp.where(bad[..., None], jnp.nan, c)


@dataclasses.dataclass(frozen=True)
class ParallelLineModel(LineModel):
    """Line parallel to ``axis`` within eps_angle (reference:
    sac_model_parallel_line.h)."""
    axis: Tuple[float, float, float] = (0.0, 0.0, 1.0)
    eps_angle: float = 0.2

    def fit(self, samples, normals=None):
        c = LineModel.fit(self, samples, normals)
        ang = _angle_between(c[..., 3:6], jnp.asarray(self.axis, c.dtype))
        return jnp.where((ang > self.eps_angle)[..., None], jnp.nan, c)


@dataclasses.dataclass(frozen=True)
class NormalPlaneModel(PlaneModel):
    """Plane scored by a weighted mix of point distance and surface-normal
    angle (reference: sac_model_normal_plane.h, normal_distance_weight)."""
    normal_distance_weight: float = 0.1
    scores_with_normals: bool = True
    needs_normals: bool = True

    def distances(self, coeffs, xyz, normals=None):
        d_pt = PlaneModel.distances(self, coeffs, xyz)
        if normals is None:
            return d_pt
        n = coeffs[..., None, :3]
        cosang = jnp.abs(jnp.sum(n * normals, axis=-1))
        d_ang = jnp.arccos(jnp.clip(cosang, 0.0, 1.0))
        w = self.normal_distance_weight
        return w * d_ang + (1.0 - w) * d_pt


@dataclasses.dataclass(frozen=True)
class NormalParallelPlaneModel(NormalPlaneModel):
    """Normal-scored plane constrained perpendicular to ``axis`` (reference:
    sac_model_normal_parallel_plane.h — plane normal PARALLEL to axis)."""
    axis: Tuple[float, float, float] = (0.0, 0.0, 1.0)
    eps_angle: float = 0.2

    def fit(self, samples, normals=None):
        c = PlaneModel.fit(self, samples, normals)
        ang = _angle_between(c[..., :3], jnp.asarray(self.axis, c.dtype))
        return jnp.where((ang > self.eps_angle)[..., None], jnp.nan, c)


@dataclasses.dataclass(frozen=True)
class NormalSphereModel(SphereModel):
    """Sphere scored with the surface-normal agreement term (reference:
    sac_model_normal_sphere.h)."""
    normal_distance_weight: float = 0.1
    scores_with_normals: bool = True
    needs_normals: bool = True

    def distances(self, coeffs, xyz, normals=None):
        d_pt = SphereModel.distances(self, coeffs, xyz)
        if normals is None:
            return d_pt
        c = coeffs[..., None, :3]
        radial = _unit(xyz - c)
        cosang = jnp.abs(jnp.sum(radial * normals, axis=-1))
        d_ang = jnp.arccos(jnp.clip(cosang, 0.0, 1.0))
        w = self.normal_distance_weight
        return w * d_ang + (1.0 - w) * d_pt


@dataclasses.dataclass(frozen=True)
class RegistrationModel(SacModel):
    """Rigid transform between paired clouds (reference:
    sac_model_registration.h — ICP's RANSAC correspondence rejector model).

    "Points" are correspondence indices; fit() takes sampled source/target
    PAIRS and returns a flattened 4x4; distances() are post-transform
    residuals per correspondence. Use with ransac(..., paired_target=...).
    """
    sample_size: int = 3
    coeff_size: int = 16

    def fit(self, samples, normals=None, target_samples=None):
        if target_samples is None:
            raise ValueError("RegistrationModel requires target_samples")
        w = jnp.ones(samples.shape[:-1], samples.dtype)
        T = geometry.umeyama(samples, target_samples, w)
        return T.reshape(T.shape[:-2] + (16,))

    def distances(self, coeffs, xyz, target_xyz=None):
        """coeffs [..., 16] x paired xyz/target_xyz [N, 3] -> [..., N]."""
        if target_xyz is None:
            raise ValueError("RegistrationModel requires target_xyz")
        T = coeffs.reshape(coeffs.shape[:-1] + (4, 4))
        R = T[..., :3, :3]
        t = T[..., :3, 3]
        src_t = jnp.einsum("...ij,nj->...ni", R, xyz) + t[..., None, :]
        return jnp.linalg.norm(src_t - target_xyz, axis=-1)

    def refine(self, coeffs, xyz, weights, target_xyz=None):
        if target_xyz is None:
            return coeffs
        T = geometry.umeyama(xyz, target_xyz, weights)
        return T.reshape(T.shape[:-2] + (16,))
