"""libsvm model-file interop tests (VERDICT r3 #9): load a
reference-format model and match its decision function; round-trip our own
models through the format."""

import numpy as np
import jax.numpy as jnp
import pytest

from pcl_tpu.ml import (SVMModel, load_libsvm_model, save_libsvm_model,
                        svm_classify)
from pcl_tpu.ml.svm import svm_classify_dual, svm_train_dual


REFERENCE_RBF_MODEL = """\
svm_type c_svc
kernel_type rbf
gamma 0.25
nr_class 2
total_sv 4
rho 0.125
label 1 -1
nr_sv 2 2
SV
0.5 1:1.0 2:0.5
0.75 1:0.8 3:-0.2
-0.5 1:-1.0 2:-0.5
-0.75 2:0.1 3:0.9
"""


def _manual_rbf_decision(x, sv, coef, rho, gamma):
    d2 = ((x[:, None, :] - sv[None, :, :]) ** 2).sum(-1)
    return np.exp(-gamma * d2) @ coef - rho


class TestLoad:
    def test_reference_rbf_decision_parity(self, tmp_path):
        p = tmp_path / "m.model"
        p.write_text(REFERENCE_RBF_MODEL)
        model = load_libsvm_model(str(p))
        assert model.kernel == "rbf"
        assert model.support.shape == (4, 3)
        rng = np.random.default_rng(0)
        x = rng.normal(size=(16, 3)).astype(np.float32)
        got = np.asarray(svm_classify_dual(model, jnp.asarray(x)))
        sv = np.array([[1.0, 0.5, 0.0], [0.8, 0.0, -0.2],
                       [-1.0, -0.5, 0.0], [0.0, 0.1, 0.9]])
        coef = np.array([0.5, 0.75, -0.5, -0.75])
        want = _manual_rbf_decision(x, sv, coef, 0.125, 0.25)
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_label_order_flip(self, tmp_path):
        """A model whose libsvm label order is (-1, 1) must classify with
        the same positive=+1 convention."""
        flipped = REFERENCE_RBF_MODEL.replace("label 1 -1", "label -1 1")
        p = tmp_path / "m.model"
        p.write_text(flipped)
        model = load_libsvm_model(str(p))
        pf = tmp_path / "m0.model"
        pf.write_text(REFERENCE_RBF_MODEL)
        base = load_libsvm_model(str(pf))
        x = jnp.asarray(np.random.default_rng(1).normal(size=(8, 3)),
                        jnp.float32)
        np.testing.assert_allclose(np.asarray(svm_classify_dual(model, x)),
                                   -np.asarray(svm_classify_dual(base, x)),
                                   atol=1e-6)

    def test_rejects_unsupported(self, tmp_path):
        p = tmp_path / "m.model"
        p.write_text(REFERENCE_RBF_MODEL.replace("c_svc", "nu_svc"))
        with pytest.raises(ValueError):
            load_libsvm_model(str(p))


class TestRoundTrip:
    def test_dual_rbf_roundtrip(self, tmp_path):
        rng = np.random.default_rng(3)
        x = rng.normal(size=(64, 4)).astype(np.float32)
        y = (x[:, 0] + 0.5 * x[:, 1] > 0).astype(np.float32) * 2 - 1
        model = svm_train_dual(jnp.asarray(x), jnp.asarray(y),
                               kernel="rbf", gamma=0.5, iterations=200)
        p = tmp_path / "rt.model"
        # identity normalization required for rbf export
        model_id = model._replace(mean=jnp.zeros_like(model.mean),
                                  scale=jnp.ones_like(model.scale))
        save_libsvm_model(str(p), model_id)
        loaded = load_libsvm_model(str(p))
        q = jnp.asarray(rng.normal(size=(32, 4)), jnp.float32)
        np.testing.assert_allclose(
            np.asarray(svm_classify_dual(loaded, q)),
            np.asarray(svm_classify_dual(model_id, q)), atol=1e-4)

    def test_primal_linear_roundtrip_bakes_normalization(self, tmp_path):
        d = 3
        model = SVMModel(kernel="linear",
                         w=jnp.asarray([1.0, -2.0, 0.5]),
                         b=jnp.float32(0.25),
                         support=jnp.zeros((0, d), jnp.float32),
                         gamma=jnp.float32(0.0),
                         mean=jnp.asarray([0.1, 0.2, -0.3]),
                         scale=jnp.asarray([2.0, 1.0, 0.5]))
        p = tmp_path / "lin.model"
        save_libsvm_model(str(p), model)
        loaded = load_libsvm_model(str(p))
        q = jnp.asarray(np.random.default_rng(5).normal(size=(16, d)),
                        jnp.float32)
        np.testing.assert_allclose(
            np.asarray(svm_classify_dual(loaded, q)),
            np.asarray(svm_classify(model, q)), atol=1e-5)
