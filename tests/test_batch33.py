"""Lane-form batched 3x3 algebra (ops/batch33.py) vs numpy oracles."""

import jax.numpy as jnp
import numpy as np
import pytest

from pcl_tpu.ops import batch33


@pytest.fixture
def mats(rng):
    A = rng.normal(size=(64, 3, 3)).astype(np.float32)
    B = rng.normal(size=(64, 3, 3)).astype(np.float32)
    v = rng.normal(size=(64, 3)).astype(np.float32)
    return A, B, v


def test_roundtrip(mats):
    A, _, v = mats
    np.testing.assert_array_equal(
        np.asarray(batch33.from_lanes(batch33.to_lanes(jnp.asarray(A)))), A)
    np.testing.assert_array_equal(
        np.asarray(batch33.vec_from_lanes(batch33.vec_to_lanes(jnp.asarray(v)))), v)


def test_matmul_matvec_transpose(mats):
    A, B, v = mats
    AL, BL = batch33.to_lanes(jnp.asarray(A)), batch33.to_lanes(jnp.asarray(B))
    np.testing.assert_allclose(
        np.asarray(batch33.from_lanes(batch33.matmul(AL, BL))),
        A @ B, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(batch33.vec_from_lanes(
            batch33.matvec(AL, batch33.vec_to_lanes(jnp.asarray(v))))),
        np.einsum("nij,nj->ni", A, v), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(batch33.from_lanes(batch33.transpose(AL))),
        np.swapaxes(A, 1, 2))


def test_sandwich_inv_det_quadform(mats):
    A, _, v = mats
    # SPD matrices for a well-conditioned inverse
    S = A @ np.swapaxes(A, 1, 2) + 0.1 * np.eye(3, dtype=np.float32)
    SL = batch33.to_lanes(jnp.asarray(S))
    R = np.linalg.qr(np.random.default_rng(1).normal(size=(3, 3)))[0].astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(batch33.from_lanes(batch33.sandwich(jnp.asarray(R), SL))),
        np.einsum("ij,njk,lk->nil", R, S, R), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(batch33.det(SL)), np.linalg.det(S), rtol=1e-3)
    np.testing.assert_allclose(
        np.asarray(batch33.from_lanes(batch33.inv(SL))),
        np.linalg.inv(S), rtol=1e-3, atol=1e-3)
    vL = batch33.vec_to_lanes(jnp.asarray(v))
    np.testing.assert_allclose(
        np.asarray(batch33.quadform(SL, vL)),
        np.einsum("ni,nij,nj->n", v, S, v), rtol=1e-4)


def test_add_scaled_identity_scale_gather(mats):
    A, _, _ = mats
    AL = batch33.to_lanes(jnp.asarray(A))
    got = np.asarray(batch33.from_lanes(batch33.add_scaled_identity(AL, 2.5)))
    np.testing.assert_allclose(got, A + 2.5 * np.eye(3, dtype=np.float32))
    w = np.linspace(0, 1, 64).astype(np.float32)
    got = np.asarray(batch33.from_lanes(batch33.scale(AL, jnp.asarray(w))))
    np.testing.assert_allclose(got, A * w[:, None, None], rtol=1e-6)
    idx = jnp.asarray([3, 1, 60])
    got = np.asarray(batch33.from_lanes(batch33.gather(AL, idx)))
    np.testing.assert_array_equal(got, A[[3, 1, 60]])
