"""SVM probability estimates + cross validation.

Equivalent of the probability surface of the reference's SVM wrapper
(reference: ml/include/pcl/ml/svm_wrapper.h setProbabilityEstimates /
SVMClassify::getProbabilities, backed by libsvm's svm.cpp
``sigmoid_train`` / ``svm_binary_svc_probability`` /
``svm_cross_validation``): Platt scaling — fit a sigmoid
p(y=+1 | f) = 1 / (1 + exp(A f + B)) to CROSS-VALIDATED decision values
by Newton's method with backtracking on the regularized targets
t+ = (n+ + 1)/(n+ + 2), t- = 1/(n- + 2), then evaluate it on the
deployed model's decisions. The fitted (A, B) round-trip through the
libsvm model file as the ``probA``/``probB`` header fields
(pcl_tpu.ml.svm_io).

Calibration is a tiny host-side scalar optimization (numpy); the k-fold
decision values come from the batched dual trainer.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Tuple

import numpy as np
import jax.numpy as jnp


class PlattScaling(NamedTuple):
    A: float
    B: float


def platt_calibrate(decisions, labels, max_iters: int = 100,
                    min_step: float = 1e-10, sigma: float = 1e-12
                    ) -> PlattScaling:
    """Fit the Platt sigmoid to (decision, +/-1 label) pairs — the
    Newton-with-backtracking procedure of libsvm's sigmoid_train
    (Lin/Lin/Weng's improved implementation of Platt 1999)."""
    f = np.asarray(decisions, np.float64)
    y = np.asarray(labels)
    prior1 = int(np.sum(y > 0))
    prior0 = len(y) - prior1
    hi = (prior1 + 1.0) / (prior1 + 2.0)
    lo = 1.0 / (prior0 + 2.0)
    t = np.where(y > 0, hi, lo)

    A = 0.0
    B = np.log((prior0 + 1.0) / (prior1 + 1.0))

    def nll(a, b):
        fApB = f * a + b
        # numerically-stable cross entropy
        pos = fApB >= 0
        out = np.where(pos,
                       t * fApB + np.log1p(np.exp(-fApB)),
                       (t - 1.0) * fApB + np.log1p(np.exp(fApB)))
        return float(np.sum(out))

    fval = nll(A, B)
    for _ in range(max_iters):
        fApB = f * A + B
        p = np.where(fApB >= 0,
                     np.exp(-fApB) / (1.0 + np.exp(-fApB)),
                     1.0 / (1.0 + np.exp(fApB)))
        q = 1.0 - p
        d1 = t - p                      # gradient pieces
        d2 = p * q
        g1 = float(np.sum(f * d1))
        g2 = float(np.sum(d1))
        if abs(g1) < 1e-5 and abs(g2) < 1e-5:
            break
        h11 = float(np.sum(f * f * d2)) + sigma
        h22 = float(np.sum(d2)) + sigma
        h21 = float(np.sum(f * d2))
        det = h11 * h22 - h21 * h21
        dA = -(h22 * g1 - h21 * g2) / det
        dB = -(-h21 * g1 + h11 * g2) / det
        gd = g1 * dA + g2 * dB
        step = 1.0
        while step >= min_step:
            newA, newB = A + step * dA, B + step * dB
            newf = nll(newA, newB)
            if newf < fval + 1e-4 * step * gd:
                A, B, fval = newA, newB, newf
                break
            step /= 2.0
        else:
            break                       # line search failed
    return PlattScaling(float(A), float(B))


def platt_probability(scaling: PlattScaling, decisions) -> np.ndarray:
    """p(y=+1 | f) = 1 / (1 + exp(A f + B)) (libsvm sigmoid_predict)."""
    fApB = np.asarray(decisions, np.float64) * scaling.A + scaling.B
    return np.where(fApB >= 0,
                    np.exp(-fApB) / (1.0 + np.exp(-fApB)),
                    1.0 / (1.0 + np.exp(fApB)))


def svm_train_probability(
    x,
    y,
    n_folds: int = 5,
    seed: int = 0,
    train_fn: Optional[Callable] = None,
    classify_fn: Optional[Callable] = None,
    **train_kw,
) -> Tuple[object, PlattScaling]:
    """Train an SVM and fit its Platt sigmoid on ``n_folds``-fold
    cross-validated decision values (svm_binary_svc_probability,
    libsvm svm.cpp — calibrating on in-sample decisions overfits the
    sigmoid, so libsvm and we use held-out decisions). Returns
    (model trained on ALL data, PlattScaling)."""
    from pcl_tpu.ml.svm import svm_train_dual, svm_classify_dual
    train_fn = train_fn or svm_train_dual
    classify_fn = classify_fn or svm_classify_dual
    x = np.asarray(x, np.float32)
    y = np.asarray(y, np.float32)
    n = len(x)
    rng = np.random.default_rng(seed)
    perm = rng.permutation(n)
    dec = np.zeros(n, np.float64)
    for k in range(n_folds):
        held = perm[k::n_folds]
        tr = np.setdiff1d(perm, held)
        m = train_fn(jnp.asarray(x[tr]), jnp.asarray(y[tr]), **train_kw)
        dec[held] = np.asarray(classify_fn(m, jnp.asarray(x[held])))
    model = train_fn(jnp.asarray(x), jnp.asarray(y), **train_kw)
    return model, platt_calibrate(dec, y)


def svm_predict_probability(model, scaling: PlattScaling, x,
                            classify_fn: Optional[Callable] = None
                            ) -> np.ndarray:
    """Per-sample p(y=+1) from the model's decision values."""
    from pcl_tpu.ml.svm import svm_classify_dual
    classify_fn = classify_fn or svm_classify_dual
    dec = np.asarray(classify_fn(model, jnp.asarray(x, jnp.float32)))
    return platt_probability(scaling, dec)


def svm_cross_validation(
    x,
    y,
    n_folds: int = 5,
    seed: int = 0,
    train_fn: Optional[Callable] = None,
    classify_fn: Optional[Callable] = None,
    **train_kw,
) -> float:
    """k-fold cross-validation accuracy (the reference SVMTrain's
    svm_cross_validation surface)."""
    from pcl_tpu.ml.svm import svm_train_dual, svm_classify_dual
    train_fn = train_fn or svm_train_dual
    classify_fn = classify_fn or svm_classify_dual
    x = np.asarray(x, np.float32)
    y = np.asarray(y, np.float32)
    n = len(x)
    perm = np.random.default_rng(seed).permutation(n)
    correct = 0
    for k in range(n_folds):
        held = perm[k::n_folds]
        tr = np.setdiff1d(perm, held)
        m = train_fn(jnp.asarray(x[tr]), jnp.asarray(y[tr]), **train_kw)
        pred = np.sign(np.asarray(classify_fn(m, jnp.asarray(x[held]))))
        correct += int(np.sum(pred == np.sign(y[held])))
    return correct / float(n)
