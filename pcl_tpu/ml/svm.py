"""SVM training/classification.

Equivalent of the reference's libsvm wrapper (reference: ml/include/pcl/ml/
svm_wrapper.h:122 SVMTrain, :235 SVMClassify). Rather than porting libsvm's
SMO solver, the TPU-native form trains a kernel SVM by minimizing the primal
hinge loss with squared-hinge smoothing under full-batch gradient descent
(optax-free, pure jax) — exact enough for the per-point classification
tasks the reference uses it for (people detection, segmentation unaries),
and it jit-compiles to a handful of matmuls.

Supported kernels: linear, rbf.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class SVMModel(NamedTuple):
    kernel: str                 # static metadata carried for classify
    w: jax.Array                # [D] (linear) or dual coefs [M] (rbf)
    b: jax.Array                # scalar
    support: jax.Array          # [M,D] support set (rbf; empty for linear)
    gamma: jax.Array            # scalar (rbf)
    mean: jax.Array             # [D] feature normalization
    scale: jax.Array            # [D]


def svm_train(*args, **kw):
    """See _svm_train_core; thin wrapper so the static ``kernel`` string
    rides in the NamedTuple without being a traced jit output."""
    model = _svm_train_core(*args, **kw)
    kernel = kw.get("kernel", "linear")
    return model._replace(kernel=kernel)


@partial(jax.jit, static_argnames=("kernel", "iterations", "n_basis"))
def _svm_train_core(
    x: jax.Array,               # [N,D]
    y: jax.Array,               # [N] in {-1,+1} (or {0,1})
    mask: Optional[jax.Array] = None,
    *,
    kernel: str = "linear",
    C: float = 1.0,
    gamma: float = 1.0,
    iterations: int = 1000,
    lr: float = 0.02,
    n_basis: int = 256,
    key: Optional[jax.Array] = None,
) -> SVMModel:
    n, d = x.shape
    if mask is None:
        mask = jnp.ones((n,), bool)
    if key is None:
        key = jax.random.PRNGKey(0)
    y = jnp.where(y > 0, 1.0, -1.0)
    wgt = mask.astype(jnp.float32)
    # feature normalization (the reference's svm scaling)
    mean = jnp.sum(x * wgt[:, None], axis=0) / jnp.maximum(jnp.sum(wgt), 1.0)
    var = jnp.sum(((x - mean) ** 2) * wgt[:, None], axis=0) / jnp.maximum(jnp.sum(wgt), 1.0)
    scale = 1.0 / jnp.sqrt(jnp.maximum(var, 1e-12))
    xs = (x - mean) * scale

    if kernel == "linear":
        feats = xs
        support = jnp.zeros((0, d), jnp.float32)
        gm = jnp.float32(0.0)
    elif kernel == "rbf":
        # Nystrom-style basis: random subset as centers
        probs = wgt / jnp.maximum(jnp.sum(wgt), 1.0)
        idx = jax.random.categorical(
            key, jnp.log(probs + 1e-30)[None, :].repeat(n_basis, 0)
        ).astype(jnp.int32)
        support = xs[idx]
        d2 = jnp.sum(xs * xs, 1)[:, None] + jnp.sum(support * support, 1)[None, :] \
            - 2.0 * xs @ support.T
        feats = jnp.exp(-gamma * jnp.maximum(d2, 0.0))
        gm = jnp.float32(gamma)
    else:
        raise ValueError(f"unknown kernel {kernel!r}")

    df = feats.shape[1]

    def loss(params):
        w, b = params
        m = feats @ w + b
        hinge = jnp.maximum(0.0, 1.0 - y * m)
        return 0.5 * jnp.sum(w * w) + C * jnp.sum(wgt * hinge * hinge) / jnp.maximum(jnp.sum(wgt), 1.0)

    grad = jax.grad(loss)

    def step(params, _):
        g = grad(params)
        return (params[0] - lr * g[0], params[1] - lr * g[1]), None

    params, _ = jax.lax.scan(step, (jnp.zeros((df,)), jnp.float32(0.0)),
                             None, length=iterations)
    w, b = params
    return SVMModel(kernel=0, w=w, b=b, support=support, gamma=gm,
                    mean=mean, scale=scale)


def svm_classify(model: SVMModel, x: jax.Array) -> jax.Array:
    """Decision values [N] (positive = class +1)."""
    xs = (x - model.mean) * model.scale
    if model.kernel == "linear":
        return xs @ model.w + model.b
    d2 = jnp.sum(xs * xs, 1)[:, None] + \
        jnp.sum(model.support * model.support, 1)[None, :] - 2.0 * xs @ model.support.T
    feats = jnp.exp(-model.gamma * jnp.maximum(d2, 0.0))
    return feats @ model.w + model.b


@partial(jax.jit, static_argnames=("kernel", "iterations"))
def svm_train_dual(
    x: jax.Array,               # [N,D]
    y: jax.Array,               # [N] in {-1,+1} (or {0,1})
    mask: Optional[jax.Array] = None,
    *,
    kernel: str = "rbf",
    C: float = 1.0,
    gamma: float = 1.0,
    iterations: int = 1200,
) -> SVMModel:
    """Exact dual C-SVM solver — the libsvm/SMO capability (reference:
    ml/include/pcl/ml/svm_wrapper.h SVMTrain over bundled libsvm).

    Solves the SAME box-constrained dual QP SMO solves,

        max_a  1'a - 0.5 a' Q a,   Q_ij = y_i y_j K(x_i, x_j),
        s.t.   0 <= a_i <= C,  y'a = 0,

    but with a TPU-shaped algorithm: the bias is folded into the kernel
    (K -> K + 1, the liblinear-style regularized-bias formulation), which
    REMOVES the y'a = 0 equality constraint — the dual is then a box-only
    QP solved by FISTA-accelerated projected gradient where every step
    updates ALL alphas via one kernel-matrix matvec on the MXU and the
    projection is an exact clip. SMO's two-coordinate updates are
    inherently sequential — thousands of dependent O(N) steps — which is
    exactly what an accelerator cannot use. The optimum satisfies the same
    KKT conditions as libsvm's up to the (standard) regularized-bias
    modification, and b = y'a falls out of the augmented coordinate.

    Suitable for the reference's use sites (thousands of points, not
    millions: people detection, unary classifiers). Returns an SVMModel
    whose support set is the full training set with dual weights a*y.
    """
    n, d = x.shape
    if mask is None:
        mask = jnp.ones((n,), bool)
    y = jnp.where(y > 0, 1.0, -1.0)
    wgt = mask.astype(jnp.float32)
    mean = jnp.sum(x * wgt[:, None], axis=0) / jnp.maximum(jnp.sum(wgt), 1.0)
    var = jnp.sum(((x - mean) ** 2) * wgt[:, None], axis=0) / jnp.maximum(jnp.sum(wgt), 1.0)
    scale = 1.0 / jnp.sqrt(jnp.maximum(var, 1e-12))
    xs = (x - mean) * scale

    if kernel == "rbf":
        d2 = jnp.sum(xs * xs, 1)[:, None] + jnp.sum(xs * xs, 1)[None, :] \
            - 2.0 * xs @ xs.T
        K = jnp.exp(-gamma * jnp.maximum(d2, 0.0))
    elif kernel == "linear":
        K = xs @ xs.T
    else:
        raise ValueError(f"unknown kernel {kernel!r}")
    # bias-augmented kernel: constant feature 1 == penalized bias; the
    # equality constraint disappears and b = y'a below
    Kb = K + 1.0
    Q = (y[:, None] * y[None, :]) * Kb
    Q = Q * wgt[:, None] * wgt[None, :]

    # Lipschitz constant ||Q||_2 via a few power iterations (the row-sum
    # bound is orders too conservative for near-low-rank linear kernels)
    def pow_iter(v, _):
        v = Q @ v
        return v / jnp.maximum(jnp.linalg.norm(v), 1e-30), None
    v0 = jnp.ones((n,), jnp.float32) / jnp.sqrt(n)
    v, _ = jax.lax.scan(pow_iter, v0, None, length=16)
    L = jnp.maximum(jnp.linalg.norm(Q @ v), 1e-6)
    eta = 1.0 / L

    def project(a):
        return jnp.clip(a, 0.0, C) * wgt

    # FISTA-accelerated projected gradient on the (concave) dual
    def step(carry, _):
        a, z, t = carry
        g = 1.0 - Q @ z
        a_new = project(z + eta * g)
        t_new = 0.5 * (1.0 + jnp.sqrt(1.0 + 4.0 * t * t))
        z_new = a_new + (t - 1.0) / t_new * (a_new - a)
        return (a_new, z_new, t_new), None

    a0 = jnp.zeros((n,), jnp.float32)
    (a, _z, _t), _ = jax.lax.scan(
        step, (a0, a0, jnp.float32(1.0)), None, length=iterations)
    a = project(a)

    # the augmented constant coordinate yields the bias directly
    b = jnp.dot(y * wgt, a)
    model = SVMModel(kernel=0, w=a * y, b=b, support=xs,
                     gamma=jnp.float32(gamma if kernel == "rbf" else 0.0),
                     mean=mean, scale=scale)
    return model


def svm_classify_dual(model: SVMModel, x: jax.Array) -> jax.Array:
    """Decision values for a dual-trained model (kernel expansion over the
    stored support set)."""
    xs = (x - model.mean) * model.scale
    if float(model.gamma) == 0.0:
        K = xs @ model.support.T
    else:
        d2 = jnp.sum(xs * xs, 1)[:, None] + \
            jnp.sum(model.support * model.support, 1)[None, :] \
            - 2.0 * xs @ model.support.T
        K = jnp.exp(-model.gamma * jnp.maximum(d2, 0.0))
    return K @ model.w + model.b
