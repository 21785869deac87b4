"""ML tests — ferns, decision trees, random forest, dense CRF."""

import numpy as np

from pcl_tpu.ml import (
    Fern,
    train_fern,
    train_decision_tree,
    train_random_forest,
    DenseCRF,
)


def _xor_data(rng, n=400):
    x = rng.uniform(-1, 1, (n, 2)).astype(np.float32)
    y = ((x[:, 0] > 0) ^ (x[:, 1] > 0)).astype(np.int64)
    return x, y


def _quadrant_data(rng, n=400):
    # 4 classes = quadrants: solvable exactly by greedy axis-aligned splits
    x = rng.uniform(-1, 1, (n, 2)).astype(np.float32)
    y = (x[:, 0] > 0).astype(np.int64) + 2 * (x[:, 1] > 0).astype(np.int64)
    return x, y


class TestFern:
    def test_quadrants(self, rng):
        x, y = _quadrant_data(rng)
        fern = train_fern(x, y, depth=6, seed=3)
        acc = (fern.classify(x) == y).mean()
        assert acc > 0.9

    def test_probs_normalized(self, rng):
        x, y = _xor_data(rng)
        fern = train_fern(x, y, depth=4)
        p = fern.evaluate(x[:10])
        np.testing.assert_allclose(p.sum(1), 1.0, atol=1e-6)


class TestDecisionTree:
    def test_quadrants(self, rng):
        x, y = _quadrant_data(rng)
        t = train_decision_tree(x, y, depth=4, seed=1)
        assert (t.classify(x) == y).mean() > 0.9

    def test_multiclass(self, rng):
        x = rng.normal(size=(300, 3)).astype(np.float32)
        y = (x[:, 0] > 0).astype(np.int64) + 2 * (x[:, 1] > 0).astype(np.int64)
        t = train_decision_tree(x, y, depth=5, n_classes=4, seed=2)
        assert (t.classify(x) == y).mean() > 0.9


class TestRandomForest:
    def test_generalization(self, rng):
        x, y = _xor_data(rng, n=600)
        rf = train_random_forest(x[:400], y[:400], n_trees=6, depth=5)
        assert (rf.classify(x[400:]) == y[400:]).mean() > 0.85


class TestDenseCRF:
    def test_spatial_smoothing(self, rng):
        # two spatial blobs; unary is noisy, CRF must denoise by proximity
        n = 200
        a = rng.normal(scale=0.2, size=(n, 3)).astype(np.float32)
        b = rng.normal(scale=0.2, size=(n, 3)).astype(np.float32) + [3, 0, 0]
        xyz = np.concatenate([a, b])
        true = np.concatenate([np.zeros(n), np.ones(n)]).astype(np.int64)
        # unary: correct with prob 0.7, flipped otherwise
        flip = rng.uniform(size=2 * n) < 0.3
        noisy = np.where(flip, 1 - true, true)
        unary = np.full((2 * n, 2), 2.0, np.float32)
        unary[np.arange(2 * n), noisy] = 0.1
        assert (noisy == true).mean() < 0.8

        crf = DenseCRF(2 * n, 2)
        crf.set_unary_energy(unary)
        crf.add_pairwise_gaussian(xyz, sx=0.4, w=4.0)
        labels = crf.map_labels(n_iterations=8)
        assert (labels == true).mean() > 0.95

    def test_bilateral_color(self, rng):
        # same position spread; color separates classes
        n = 150
        xyz = rng.uniform(0, 1, (2 * n, 3)).astype(np.float32)
        rgb = np.zeros((2 * n, 3), np.float32)
        rgb[:n, 0] = 1.0
        rgb[n:, 2] = 1.0
        true = np.concatenate([np.zeros(n), np.ones(n)]).astype(np.int64)
        flip = rng.uniform(size=2 * n) < 0.25
        noisy = np.where(flip, 1 - true, true)
        unary = np.full((2 * n, 2), 1.5, np.float32)
        unary[np.arange(2 * n), noisy] = 0.2
        crf = DenseCRF(2 * n, 2)
        crf.set_unary_energy(unary)
        crf.add_pairwise_bilateral(xyz, rgb, sx=2.0, sr=0.3, w=5.0)
        labels = crf.map_labels(n_iterations=8)
        assert (labels == true).mean() > 0.95


class TestModelPersistence:
    """Fern/tree/forest serialization (the reference's model iostream
    operators, ml/dt/decision_forest.h; .npz container here)."""

    def test_roundtrip_all_kinds(self, tmp_path):
        import numpy as np
        from pcl_tpu.ml import (train_fern, train_decision_tree,
                                train_random_forest, save_model, load_model)
        rng = np.random.default_rng(0)
        x = rng.normal(size=(400, 6)).astype(np.float32)
        y = (x[:, 0] + 0.5 * x[:, 3] > 0).astype(np.int32)
        models = {
            "fern.npz": train_fern(x, y, depth=6),
            "tree.npz": train_decision_tree(x, y, depth=5),
            "forest.npz": train_random_forest(x, y, n_trees=4, depth=4),
        }
        for name, m in models.items():
            p = str(tmp_path / name)
            save_model(p, m)
            back = load_model(p)
            np.testing.assert_array_equal(back.classify(x), m.classify(x))
            np.testing.assert_allclose(back.evaluate(x), m.evaluate(x),
                                       rtol=1e-6)
