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
        ok = det_ok & (r2 > 0)
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
        return jnp.where((bad | (den < 1e-12))[..., None], jnp.nan, coeffs)

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
