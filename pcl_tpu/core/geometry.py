"""Masked batched geometry primitives.

TPU-native equivalents of PCL's free math functions:
- centroid / covariance: reference common/include/pcl/common/centroid.h:66
  (compute3DCentroid, computeMeanAndCovarianceMatrix)
- eigen33: reference common/include/pcl/common/eigen.h (analytic symmetric
  3x3 eigen-decomposition used by normal estimation)
- Umeyama rigid alignment: reference common/include/pcl/registration/
  transformation_estimation_svd.hpp:137-186
- PCA: reference common/include/pcl/common/pca.h

All functions take explicit validity masks or weights; padding rows must be
zero (which Cloud guarantees) so plain sums are masked sums.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

_EPS = 1e-12


def masked_mean(x: jax.Array, mask: jax.Array, axis: int = 0) -> jax.Array:
    """Mean of x over ``axis`` counting only mask==True rows."""
    w = mask.astype(x.dtype)
    shape = [1] * x.ndim
    shape[axis] = x.shape[axis]
    w = w.reshape(shape) if w.ndim != x.ndim else w
    num = jnp.sum(x * w, axis=axis)
    den = jnp.maximum(jnp.sum(w, axis=axis), 1.0)
    return num / den


def centroid(xyz: jax.Array, mask: jax.Array) -> jax.Array:
    """[..., N, 3], [..., N] -> [..., 3] masked centroid."""
    w = mask.astype(xyz.dtype)
    num = jnp.sum(xyz * w[..., None], axis=-2)
    den = jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1.0)
    return num / den


def mean_and_covariance(
    xyz: jax.Array,
    mask: jax.Array,
    weights: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Masked (optionally weighted) mean and 3x3 covariance.

    Works on ``[..., N, 3]`` batched inputs. Returns ``(mean [...,3],
    cov [...,3,3], count [...])``. Covariance is normalized by the valid
    count (population covariance), matching PCL's
    computeMeanAndCovarianceMatrix.
    """
    w = mask.astype(xyz.dtype)
    if weights is not None:
        w = w * weights
    wsum = jnp.sum(w, axis=-1)
    den = jnp.maximum(wsum, _EPS)
    mu = jnp.sum(xyz * w[..., None], axis=-2) / den[..., None]
    d = (xyz - mu[..., None, :]) * w[..., None]
    # cov = sum_i w_i (x-mu)(x-mu)^T / sum w — contraction over N rides the MXU.
    cov = jnp.einsum("...ni,...nj->...ij", d, xyz - mu[..., None, :]) / den[..., None, None]
    return mu, cov, wsum


def demean(xyz: jax.Array, mask: jax.Array) -> Tuple[jax.Array, jax.Array]:
    mu = centroid(xyz, mask)
    return jnp.where(mask[..., None], xyz - mu[..., None, :], 0.0), mu


# ---------------------------------------------------------------------------
# Analytic symmetric 3x3 eigendecomposition (batched, jit/vmap friendly)
# ---------------------------------------------------------------------------

def eigvals33(A: jax.Array) -> jax.Array:
    """Eigenvalues of symmetric ``[..., 3, 3]``, ascending. Analytic
    (trigonometric) method — no iterative loops, vectorizes over huge batches
    on the VPU (the reason PCL wrote eigen33 instead of calling Eigen's
    iterative solver; we get the same win against lax-loop eigh)."""
    A = 0.5 * (A + jnp.swapaxes(A, -1, -2))
    q = jnp.trace(A, axis1=-2, axis2=-1) / 3.0
    B = A - q[..., None, None] * jnp.eye(3, dtype=A.dtype)
    p2 = jnp.sum(B * B, axis=(-2, -1)) / 6.0
    p = jnp.sqrt(jnp.maximum(p2, _EPS))
    detB = jnp.linalg.det(B)
    r = detB / jnp.maximum(2.0 * p * p * p, _EPS)
    r = jnp.clip(r, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    e3 = q + 2.0 * p * jnp.cos(phi)                       # largest
    e1 = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)  # smallest
    e2 = 3.0 * q - e1 - e3
    # Degenerate (p2 ~ 0): all eigenvalues equal q.
    small = p2 < 1e-20
    lam = jnp.stack([e1, e2, e3], axis=-1)
    return jnp.where(small[..., None], q[..., None] * jnp.ones_like(lam), lam)


def _eigvec(A: jax.Array, lam: jax.Array) -> jax.Array:
    """Eigenvector for eigenvalue lam of symmetric 3x3 via row cross products.

    Picks the most linearly-independent pair of rows of (A - lam I); falls
    back to coordinate axes in the fully degenerate case.
    """
    M = A - lam[..., None, None] * jnp.eye(3, dtype=A.dtype)
    r0, r1, r2 = M[..., 0, :], M[..., 1, :], M[..., 2, :]
    c01 = jnp.cross(r0, r1)
    c02 = jnp.cross(r0, r2)
    c12 = jnp.cross(r1, r2)
    n01 = jnp.sum(c01 * c01, axis=-1)
    n02 = jnp.sum(c02 * c02, axis=-1)
    n12 = jnp.sum(c12 * c12, axis=-1)
    # choose the largest-norm cross product
    best = jnp.where(
        (n01 >= n02)[..., None] & (n01 >= n12)[..., None], c01,
        jnp.where((n02 >= n12)[..., None], c02, c12),
    )
    nbest = jnp.maximum(jnp.sum(best * best, axis=-1, keepdims=True), _EPS)
    v = best / jnp.sqrt(nbest)
    # fully degenerate: any unit vector works
    degenerate = jnp.maximum(jnp.maximum(n01, n02), n12) < 1e-24
    fallback = jnp.zeros_like(v).at[..., 0].set(1.0)
    return jnp.where(degenerate[..., None], fallback, v)


def _orthogonal_complement(v: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Unit vectors (a, b) spanning the plane orthogonal to unit vector v.
    Branch-free (Eberly's computeOrthogonalComplement)."""
    # pick the axis where |v| is largest to build a stable first cross
    use_x = jnp.abs(v[..., 0]) > jnp.abs(v[..., 1])
    inv = jax.lax.rsqrt(
        jnp.maximum(
            jnp.where(
                use_x,
                v[..., 0] * v[..., 0] + v[..., 2] * v[..., 2],
                v[..., 1] * v[..., 1] + v[..., 2] * v[..., 2],
            ),
            _EPS,
        )
    )
    a_x = jnp.where(use_x, -v[..., 2] * inv, jnp.zeros_like(inv))
    a_y = jnp.where(use_x, jnp.zeros_like(inv), v[..., 2] * inv)
    a_z = jnp.where(use_x, v[..., 0] * inv, -v[..., 1] * inv)
    a = jnp.stack([a_x, a_y, a_z], axis=-1)
    b = jnp.cross(v, a)
    return a, b


def eigh33(A: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Batched symmetric 3x3 eigendecomposition.

    Returns ``(eigvals [..., 3] ascending, eigvecs [..., 3, 3])`` with
    ``eigvecs[..., :, k]`` the unit eigenvector of ``eigvals[..., k]``.
    Robust Eberly-style scheme: extract the best-isolated eigenvector via row
    cross products, then solve the remaining symmetric 2x2 problem in its
    orthogonal plane — always returns an orthonormal basis, even for repeated
    eigenvalues.
    """
    A = 0.5 * (A + jnp.swapaxes(A, -1, -2))
    # Scale for conditioning (PCL eigen33 does the same).
    scale = jnp.maximum(jnp.max(jnp.abs(A), axis=(-2, -1)), _EPS)
    As = A / scale[..., None, None]
    lam = eigvals33(As)
    # the eigenvalue farthest from the other two has the best-conditioned
    # eigenvector; extract that one by cross products
    iso_is_0 = (lam[..., 1] - lam[..., 0]) >= (lam[..., 2] - lam[..., 1])
    lam_iso = jnp.where(iso_is_0, lam[..., 0], lam[..., 2])
    v_iso = _eigvec(As, lam_iso)
    a, b = _orthogonal_complement(v_iso)
    # project A onto span{a, b}: symmetric 2x2
    Aa = jnp.einsum("...ij,...j->...i", As, a)
    Ab = jnp.einsum("...ij,...j->...i", As, b)
    m00 = jnp.sum(a * Aa, axis=-1)
    m01 = jnp.sum(a * Ab, axis=-1)
    m11 = jnp.sum(b * Ab, axis=-1)
    half_tr = 0.5 * (m00 + m11)
    disc = jnp.sqrt(jnp.maximum(0.25 * (m00 - m11) ** 2 + m01 * m01, 0.0))
    mu_lo = half_tr - disc
    mu_hi = half_tr + disc

    def plane_vec(mu):
        # eigenvector of [[m00,m01],[m01,m11]] for eigenvalue mu
        c0a, c1a = m01, mu - m00
        c0b, c1b = mu - m11, m01
        use_a = jnp.abs(c1a) + jnp.abs(c0a) >= jnp.abs(c1b) + jnp.abs(c0b)
        c0 = jnp.where(use_a, c0a, c0b)
        c1 = jnp.where(use_a, c1a, c1b)
        nrm = jnp.sqrt(jnp.maximum(c0 * c0 + c1 * c1, 0.0))
        degenerate = nrm < 1e-12
        c0 = jnp.where(degenerate, 1.0, c0 / jnp.maximum(nrm, _EPS))
        c1 = jnp.where(degenerate, 0.0, c1 / jnp.maximum(nrm, _EPS))
        return c0[..., None] * a + c1[..., None] * b

    w_lo = plane_vec(mu_lo)
    # second plane vector: orthogonal to both v_iso and w_lo
    w_hi = jnp.cross(v_iso, w_lo)
    # assemble ascending: if iso is lam0, plane holds (lam1, lam2)
    v0 = jnp.where(iso_is_0[..., None], v_iso, w_lo)
    v1 = jnp.where(iso_is_0[..., None], w_lo, w_hi)
    v2 = jnp.where(iso_is_0[..., None], w_hi, v_iso)
    V = jnp.stack([v0, v1, v2], axis=-1)
    return lam * scale[..., None], V


def smallest_eigenvector33(A: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """(unit eigenvector of smallest eigenvalue, eigenvalues ascending)."""
    lam, V = eigh33(A)
    return V[..., :, 0], lam


# ---------------------------------------------------------------------------
# Rigid alignment (Umeyama / weighted SVD, Horn quaternion form)
# ---------------------------------------------------------------------------

def rotation_from_cross_covariance(
    H: jax.Array, iters: int = 16, rqi_iters: int = 3
) -> jax.Array:
    """Optimal rotation R maximizing trace(R^T H) for H = sum w d s^T,
    via Horn's unit-quaternion method: the top eigenvector of the symmetric
    4x4 K(H), found by shifted power iteration + Rayleigh-quotient inverse
    iteration (branch-free — XLA's iterative 3x3 SVD dominates an ICP
    iteration on TPU; this is a handful of 4x4 matvecs/solves instead).
    The RQI tail converges cubically where plain shifted power iteration
    stalls on small eigen-gaps (e.g. minimal 3-point samples).

    Batched over leading dims.
    """
    Sxx, Sxy, Sxz = H[..., 0, 0], H[..., 0, 1], H[..., 0, 2]
    Syx, Syy, Syz = H[..., 1, 0], H[..., 1, 1], H[..., 1, 2]
    Szx, Szy, Szz = H[..., 2, 0], H[..., 2, 1], H[..., 2, 2]
    # K matrix (Horn 1987) for R maximizing sum w (R s) . d with H = sum d s^T
    K = jnp.stack([
        jnp.stack([Sxx + Syy + Szz, Szy - Syz, Sxz - Szx, Syx - Sxy], -1),
        jnp.stack([Szy - Syz, Sxx - Syy - Szz, Sxy + Syx, Szx + Sxz], -1),
        jnp.stack([Sxz - Szx, Sxy + Syx, -Sxx + Syy - Szz, Syz + Szy], -1),
        jnp.stack([Syx - Sxy, Szx + Sxz, Syz + Szy, -Sxx - Syy + Szz], -1),
    ], axis=-2)
    # shift to make the top eigenvalue dominant and positive
    shift = jnp.linalg.norm(K, axis=(-2, -1)) + 1e-12
    Ks = K + shift[..., None, None] * jnp.eye(4, dtype=K.dtype)

    q0 = jnp.broadcast_to(
        jnp.asarray([1.0, 0.0, 0.0, 0.0], K.dtype), K.shape[:-2] + (4,)
    )

    def body(q, _):
        q = jnp.einsum("...ij,...j->...i", Ks, q)
        q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), _EPS)
        return q, None

    q, _ = jax.lax.scan(body, q0, None, length=iters)

    eye4 = jnp.eye(4, dtype=K.dtype)

    def rqi(q, _):
        rho = jnp.einsum("...i,...ij,...j->...", q, K, q)
        A = K - rho[..., None, None] * eye4
        # regularized inverse iteration: (A + eps I) y = q. Near convergence
        # A is ~singular along q, which is exactly the direction inverse
        # iteration amplifies; the jitter keeps the solve finite.
        A = A + 1e-6 * (1.0 + jnp.abs(rho))[..., None, None] * eye4
        y = jnp.linalg.solve(A, q[..., None])[..., 0]
        y = y / jnp.maximum(jnp.linalg.norm(y, axis=-1, keepdims=True), _EPS)
        # keep sign continuity (solve may flip the direction)
        s = jnp.sign(jnp.sum(y * q, axis=-1, keepdims=True))
        y = y * jnp.where(s == 0, 1.0, s)
        # guard: fall back to the power-iteration vector on a failed solve
        ok = jnp.all(jnp.isfinite(y), axis=-1, keepdims=True)
        return jnp.where(ok, y, q), None

    q, _ = jax.lax.scan(rqi, q, None, length=rqi_iters)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    # quaternion -> rotation matrix
    R = jnp.stack([
        jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], -1),
        jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], -1),
        jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], -1),
    ], axis=-2)
    return R


def umeyama(
    src: jax.Array,
    dst: jax.Array,
    weights: jax.Array,
    with_scale: bool = False,
) -> jax.Array:
    """Weighted least-squares rigid transform src -> dst. Returns 4x4.

    Closed-form SVD solution (reference: registration/include/pcl/registration/
    impl/transformation_estimation_svd.hpp:137-186). ``weights`` double as the
    correspondence validity mask — a zero weight removes the pair.

    Accepts batched ``[..., N, 3]`` inputs.
    """
    w = weights.astype(src.dtype)
    wsum = jnp.maximum(jnp.sum(w, axis=-1), _EPS)
    mu_s = jnp.sum(src * w[..., None], axis=-2) / wsum[..., None]
    mu_d = jnp.sum(dst * w[..., None], axis=-2) / wsum[..., None]
    ds = src - mu_s[..., None, :]
    dd = dst - mu_d[..., None, :]
    # 3x3 cross-covariance: H = sum_i w_i dd_i ds_i^T
    H = jnp.einsum("...ni,...nj->...ij", dd * w[..., None], ds)
    if with_scale:
        # scale needs the singular values: keep the SVD form here
        U, S, Vt = jnp.linalg.svd(H)
        d = jnp.sign(jnp.linalg.det(U) * jnp.linalg.det(Vt))
        D = jnp.concatenate(
            [jnp.ones_like(S[..., :2]), d[..., None]], axis=-1
        )
        R = jnp.einsum("...ik,...k,...kj->...ij", U, D, Vt)
        # c = trace(D S) / (sum_i w_i ||ds_i||^2)
        c = jnp.sum(S * D, axis=-1) / jnp.maximum(jnp.sum(jnp.sum(ds * ds, axis=-1) * w, axis=-1), _EPS)
        R = R * c[..., None, None]
    else:
        # rigid case: Horn quaternion (always a proper rotation, no
        # iterative SVD in the ICP hot loop)
        R = rotation_from_cross_covariance(H)
    t = mu_d - jnp.einsum("...ij,...j->...i", R, mu_s)
    T = jnp.zeros(src.shape[:-2] + (4, 4), src.dtype)
    T = T.at[..., :3, :3].set(R)
    T = T.at[..., :3, 3].set(t)
    T = T.at[..., 3, 3].set(1.0)
    return T


def pca(xyz: jax.Array, mask: jax.Array) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Masked PCA (reference: common/include/pcl/common/pca.h).

    Returns (mean [3], eigenvalues [3] descending, eigenvectors [3,3]
    columns, descending)."""
    mu, cov, _ = mean_and_covariance(xyz, mask)
    lam, V = eigh33(cov)
    return mu, lam[..., ::-1], V[..., :, ::-1]


# ---------------------------------------------------------------------------
# Distances / norms / fitness
# ---------------------------------------------------------------------------

def pairwise_sqdist(a: jax.Array, b: jax.Array) -> jax.Array:
    """[N,3] x [M,3] -> [N,M] squared distances via the matmul identity
    ||a-b||^2 = ||a||^2 + ||b||^2 - 2 a.b (the MXU-friendly form)."""
    a2 = jnp.sum(a * a, axis=-1)
    b2 = jnp.sum(b * b, axis=-1)
    ab = a @ b.T
    return jnp.maximum(a2[:, None] + b2[None, :] - 2.0 * ab, 0.0)


def hausdorff(a: jax.Array, amask: jax.Array, b: jax.Array, bmask: jax.Array) -> jax.Array:
    """Symmetric Hausdorff distance (reference: tools/compute_hausdorff.cpp)."""
    d = jnp.sqrt(pairwise_sqdist(a, b))
    big = jnp.asarray(jnp.inf, d.dtype)
    da = jnp.where(amask, jnp.min(jnp.where(bmask[None, :], d, big), axis=1), 0.0)
    db = jnp.where(bmask, jnp.min(jnp.where(amask[:, None], d, big), axis=0), 0.0)
    return jnp.maximum(jnp.max(da), jnp.max(db))
