"""SVM probability estimates (Platt scaling) + cross-validation —
the probability surface of the reference SVM wrapper
(svm_wrapper.h setProbabilityEstimates, libsvm sigmoid_train /
svm_binary_svc_probability), with probA/probB model-file interop.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from pcl_tpu.ml import (
    platt_calibrate,
    platt_probability,
    svm_train_probability,
    svm_predict_probability,
    svm_cross_validation,
    save_libsvm_model,
    load_libsvm_model,
    load_libsvm_probability,
    PlattScaling,
)
from pcl_tpu.ml.svm import svm_classify_dual


def _blobs(n=200, sep=2.0, seed=0):
    rng = np.random.default_rng(seed)
    xp = rng.normal(+sep / 2, 1.0, (n // 2, 2))
    xn = rng.normal(-sep / 2, 1.0, (n // 2, 2))
    x = np.vstack([xp, xn]).astype(np.float32)
    y = np.r_[np.ones(n // 2), -np.ones(n // 2)].astype(np.float32)
    return x, y


def test_platt_recovers_known_sigmoid():
    # decisions drawn so that p(y=+1|f) = 1/(1+exp(-2f + 0.5))
    rng = np.random.default_rng(3)
    f = rng.normal(0, 2.0, 4000)
    p = 1.0 / (1.0 + np.exp(-2.0 * f + 0.5))
    y = np.where(rng.uniform(size=len(f)) < p, 1.0, -1.0)
    sc = platt_calibrate(f, y)
    # generating sigmoid has A=-2, B=0.5 in libsvm's 1/(1+exp(A f + B))
    assert abs(sc.A - (-2.0)) < 0.25, sc
    assert abs(sc.B - 0.5) < 0.2, sc
    # probabilities are calibrated: mean |p_hat - p| small
    np.testing.assert_allclose(platt_probability(sc, f), p, atol=0.08)


def test_train_probability_end_to_end():
    x, y = _blobs()
    model, sc = svm_train_probability(x, y, n_folds=5)
    p = svm_predict_probability(model, sc, x)
    # confident & correct on the blob centers
    assert p[y > 0].mean() > 0.8
    assert p[y < 0].mean() < 0.2
    # monotone in the decision value
    dec = np.asarray(svm_classify_dual(model, jnp.asarray(x)))
    order = np.argsort(dec)
    assert (np.diff(p[order]) >= -1e-12).all()


def _train_identity_norm(x, y, **kw):
    """rbf export to libsvm format requires identity normalization; train
    on pre-standardized data and strip the (near-identity) stats so the
    exported decision function is exact."""
    from pcl_tpu.ml.svm import svm_train_dual
    m = svm_train_dual(x, y, **kw)
    return m._replace(mean=jnp.zeros_like(m.mean),
                      scale=jnp.ones_like(m.scale))


def test_probability_file_interop(tmp_path):
    x, y = _blobs()
    x = (x - x.mean(0)) / x.std(0)
    model, sc = svm_train_probability(x, y, n_folds=4,
                                      train_fn=_train_identity_norm)
    path = str(tmp_path / "prob.model")
    save_libsvm_model(path, model, platt=sc)
    with open(path) as f:
        txt = f.read()
    assert "probA" in txt and "probB" in txt
    m2 = load_libsvm_model(path)
    sc2 = load_libsvm_probability(path)
    assert sc2 is not None
    p1 = svm_predict_probability(model, sc, x)
    p2 = svm_predict_probability(m2, sc2, x)
    np.testing.assert_allclose(p1, p2, atol=1e-4)


def test_no_probability_returns_none(tmp_path):
    x, y = _blobs(80)
    x = (x - x.mean(0)) / x.std(0)
    model, _ = svm_train_probability(x, y, n_folds=4,
                                     train_fn=_train_identity_norm)
    path = str(tmp_path / "plain.model")
    save_libsvm_model(path, model)
    assert load_libsvm_probability(path) is None


def test_cross_validation_accuracy():
    x, y = _blobs(160, sep=3.0)
    acc = svm_cross_validation(x, y, n_folds=4)
    assert acc > 0.9, acc
