"""libsvm model-file interop (VERDICT r3 #9).

The reference bundles libsvm and its SVMTrain/SVMClassify wrappers save and
load models in libsvm's text format (reference: ml/include/pcl/ml/
svm_wrapper.h:122,235; format written by libsvm's svm_save_model in
ml/src/svm.cpp). This module reads/writes that format so models trained by
the reference (or stock libsvm) classify here and vice versa.

Supported: ``svm_type c_svc`` (2-class) with ``kernel_type`` linear or rbf.
The loaded model is an :class:`pcl_tpu.ml.SVMModel` whose decision values
come from ``svm_classify_dual`` (kernel expansion over the stored support
vectors); sign convention is normalized so positive = the model's label
``+1`` regardless of libsvm's internal label order.
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np
import jax.numpy as jnp

from pcl_tpu.ml.svm import SVMModel

_SUPPORTED_KERNELS = {"linear": 0, "rbf": 2}
_KERNEL_NAMES = {0: "linear", 2: "rbf"}


def load_libsvm_model(path: str) -> SVMModel:
    """Parse a libsvm model file into an SVMModel (c_svc, 2-class,
    linear/rbf). Decision values: positive = label +1."""
    header: Dict[str, List[str]] = {}
    sv_lines: List[str] = []
    with open(path) as f:
        in_sv = False
        for line in f:
            line = line.strip()
            if not line:
                continue
            if in_sv:
                sv_lines.append(line)
                continue
            if line == "SV":
                in_sv = True
                continue
            parts = line.split()
            header[parts[0]] = parts[1:]

    svm_type = header.get("svm_type", ["c_svc"])[0]
    if svm_type != "c_svc":
        raise ValueError(f"unsupported svm_type {svm_type!r} (c_svc only)")
    ktype = header.get("kernel_type", ["rbf"])[0]
    if ktype not in _SUPPORTED_KERNELS:
        raise ValueError(
            f"unsupported kernel_type {ktype!r} (linear/rbf only)")
    nr_class = int(header.get("nr_class", ["2"])[0])
    if nr_class != 2:
        raise ValueError(f"only 2-class models supported, got {nr_class}")
    total_sv = int(header.get("total_sv", [str(len(sv_lines))])[0])
    rho = float(header["rho"][0])
    gamma = float(header.get("gamma", ["0"])[0])
    labels = [int(v) for v in header.get("label", ["1", "-1"])]

    coefs = np.zeros((total_sv,), np.float32)
    feats: List[Dict[int, float]] = []
    max_idx = 0
    for i, line in enumerate(sv_lines[:total_sv]):
        parts = line.split()
        coefs[i] = float(parts[0])
        row: Dict[int, float] = {}
        for tok in parts[1:]:
            k, v = tok.split(":")
            row[int(k)] = float(v)
            max_idx = max(max_idx, int(k))
        feats.append(row)
    sv = np.zeros((total_sv, max_idx), np.float32)
    for i, row in enumerate(feats):
        for k, v in row.items():
            sv[i, k - 1] = v          # libsvm indices are 1-based

    # libsvm decision: f(x) = sum_i coef_i K(sv_i, x) - rho, predicting
    # labels[0] when positive. Normalize so positive = +1.
    b = -rho
    if labels[0] < 0:
        coefs = -coefs
        b = -b
    d = sv.shape[1]
    return SVMModel(
        kernel=ktype,
        w=jnp.asarray(coefs),
        b=jnp.float32(b),
        support=jnp.asarray(sv),
        gamma=jnp.float32(gamma if ktype == "rbf" else 0.0),
        mean=jnp.zeros((d,), jnp.float32),
        scale=jnp.ones((d,), jnp.float32),
    )


def load_libsvm_probability(path: str):
    """The model file's Platt sigmoid (probA/probB headers), adjusted to
    OUR sign convention (positive decision = label +1): libsvm's sigmoid
    gives p(label[0] | f); when the file's first label is -1 the loader
    negates the decision values, so the equivalent sigmoid for p(+1)
    is (A, -B). Returns PlattScaling or None when the model carries no
    probability information."""
    from pcl_tpu.ml.svm_prob import PlattScaling
    header: Dict[str, List[str]] = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line == "SV":
                break
            parts = line.split()
            if parts:
                header[parts[0]] = parts[1:]
    if "probA" not in header or "probB" not in header:
        return None
    A = float(header["probA"][0])
    B = float(header["probB"][0])
    labels = [int(v) for v in header.get("label", ["1", "-1"])]
    if labels[0] < 0:
        B = -B
    return PlattScaling(A, B)


def save_libsvm_model(path: str, model: SVMModel, platt=None) -> None:
    """Write an SVMModel as a libsvm model file the reference can load.

    Dual (kernel-expansion) models write their support set + dual coefs.
    Primal linear models (empty support) write the weight vector as one
    linear-kernel support vector with coefficient 1 — mathematically the
    same decision function. Feature normalization must be identity for
    kernel models (libsvm has no normalization field); linear models bake
    it into the weights.
    """
    mean = np.asarray(model.mean, np.float64)
    scale = np.asarray(model.scale, np.float64)
    w = np.asarray(model.w, np.float64)
    b = float(model.b)
    support = np.asarray(model.support, np.float64)
    gamma = float(model.gamma)
    is_rbf = gamma != 0.0

    if support.size == 0 or support.ndim != 2 or model.kernel == "linear" \
            and support.shape[0] == 0:
        # primal linear: f(x) = w.((x-mean)*scale) + b  ->  w'.x + b'
        w_eff = w * scale
        b_eff = b - float(np.dot(w * scale, mean))
        rows = [(1.0, w_eff)]
        rho = -b_eff
        ktype = "linear"
        gamma_out = 0.0
    else:
        if is_rbf and (np.any(mean != 0.0) or np.any(scale != 1.0)):
            raise ValueError(
                "cannot export an rbf model with non-identity feature "
                "normalization to libsvm format (bake the scaling into "
                "the training data instead)")
        if not is_rbf:
            # dual linear with normalization: bake into the stored SVs
            support = (support - mean) * scale
        rows = [(float(c), sv) for c, sv in zip(w, support)]
        rho = -b
        ktype = "rbf" if is_rbf else "linear"
        gamma_out = gamma

    with open(path, "w") as f:
        f.write("svm_type c_svc\n")
        f.write(f"kernel_type {ktype}\n")
        if ktype == "rbf":
            f.write(f"gamma {gamma_out:.17g}\n")
        f.write("nr_class 2\n")
        f.write(f"total_sv {len(rows)}\n")
        f.write(f"rho {rho:.17g}\n")
        f.write("label 1 -1\n")
        if platt is not None:
            f.write(f"probA {platt.A:.17g}\n")
            f.write(f"probB {platt.B:.17g}\n")
        npos = sum(1 for c, _ in rows if c > 0)
        f.write(f"nr_sv {npos} {len(rows) - npos}\n")
        f.write("SV\n")
        for c, sv in rows:
            toks = [f"{c:.17g}"]
            for j, v in enumerate(sv):
                if v != 0.0:
                    toks.append(f"{j + 1}:{v:.17g}")
            f.write(" ".join(toks) + "\n")
