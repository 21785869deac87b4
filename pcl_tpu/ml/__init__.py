"""Machine learning utilities — TPU-native equivalent of the reference
``ml/`` module (SURVEY §2.12): k-means, a linear SVM (SMO-free, batched
gradient training — replaces the bundled libsvm wrapper for the common
linear case), and kernel density/CRF-adjacent helpers.
"""

from pcl_tpu.ml.kmeans import kmeans
from pcl_tpu.ml.svm_prob import (
    PlattScaling,
    platt_calibrate,
    platt_probability,
    svm_train_probability,
    svm_predict_probability,
    svm_cross_validation,
)
from pcl_tpu.ml.svm import (
    SVMModel,
    svm_train,
    svm_classify,
    svm_train_dual,
    svm_classify_dual,
)
from pcl_tpu.ml.svm_io import load_libsvm_model, save_libsvm_model, load_libsvm_probability
from pcl_tpu.ml.trees import (
    Fern,
    train_fern,
    DecisionTree,
    train_decision_tree,
    RandomForest,
    train_random_forest,
    save_model,
    load_model,
)
from pcl_tpu.ml.densecrf import DenseCRF
