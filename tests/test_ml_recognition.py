"""ML (kmeans, svm) + recognition (grouping, verification) tests."""

import numpy as np
import jax
import jax.numpy as jnp

from pcl_tpu.ml import kmeans, svm_train, svm_classify
from pcl_tpu.recognition import (
    geometric_consistency_grouping, hough3d_grouping,
    greedy_hypothesis_verification,
)
from pcl_tpu.core import transforms as tf


class TestKMeans:
    def test_separable_blobs(self, rng):
        centers = np.array([[0, 0, 0], [10, 0, 0], [0, 10, 0]], np.float32)
        x = np.concatenate([
            c + rng.normal(scale=0.5, size=(100, 3)).astype(np.float32)
            for c in centers
        ])
        cent, labels, it = kmeans(jnp.asarray(x), jnp.ones(300, bool), 3,
                                  key=jax.random.PRNGKey(1))
        labels = np.asarray(labels)
        for g in range(3):
            blk = labels[g * 100:(g + 1) * 100]
            assert (blk == np.bincount(blk).argmax()).mean() > 0.99
        cent_sorted = np.asarray(cent)[np.argsort(np.asarray(cent)[:, 0] + np.asarray(cent)[:, 1])]
        # centroids near truth (sorted consistently)
        expect = centers[np.argsort(centers[:, 0] + centers[:, 1])]
        np.testing.assert_allclose(cent_sorted, expect, atol=0.3)


class TestSVM:
    def test_linear_separable(self, rng):
        x = rng.normal(size=(400, 4)).astype(np.float32)
        w_true = np.float32([1.0, -2.0, 0.5, 0.0])
        y = np.sign(x @ w_true + 0.3).astype(np.float32)
        model = svm_train(jnp.asarray(x), jnp.asarray(y), C=10.0)
        pred = np.sign(np.asarray(svm_classify(model, jnp.asarray(x))))
        assert (pred == y).mean() > 0.97

    def test_rbf_nonlinear(self, rng):
        x = rng.normal(size=(500, 2)).astype(np.float32)
        y = np.where(np.linalg.norm(x, axis=1) < 1.0, 1.0, -1.0).astype(np.float32)
        model = svm_train(jnp.asarray(x), jnp.asarray(y), kernel="rbf",
                          gamma=2.0, C=10.0, iterations=800,
                          key=jax.random.PRNGKey(2))
        pred = np.sign(np.asarray(svm_classify(model, jnp.asarray(x))))
        assert (pred == y).mean() > 0.9


class TestGrouping:
    def _scene(self, rng, n_true=20, n_noise=15):
        model = rng.normal(size=(n_true, 3)).astype(np.float32)
        T = np.asarray(tf.se3_exp(jnp.asarray([0.3, -0.2, 0.5, 0.2, 0.1, -0.3], jnp.float32)))
        scene = model @ T[:3, :3].T + T[:3, 3]
        # noise correspondences: random model/scene pairs
        mn = rng.normal(size=(n_noise, 3)).astype(np.float32)
        sn = rng.normal(size=(n_noise, 3)).astype(np.float32) + 5.0
        mp = np.concatenate([model, mn])
        sp = np.concatenate([scene, sn])
        return mp, sp, T, n_true

    def test_geometric_consistency(self, rng):
        mp, sp, T, n_true = self._scene(rng)
        res = geometric_consistency_grouping(
            jnp.asarray(mp), jnp.asarray(sp), jnp.ones(len(mp), bool),
            gc_size=0.01, min_cluster_size=5, max_instances=2,
        )
        assert bool(res.instances[0])
        members = np.asarray(res.members[0])
        assert members[:n_true].mean() > 0.9
        assert members[n_true:].mean() < 0.2
        np.testing.assert_allclose(np.asarray(res.transforms[0]), T, atol=1e-3)

    def test_hough_translation(self, rng):
        model = rng.normal(size=(25, 3)).astype(np.float32)
        t = np.float32([1.0, -0.5, 2.0])
        scene = model + t
        noise_m = rng.normal(size=(10, 3)).astype(np.float32)
        noise_s = rng.uniform(-4, 4, size=(10, 3)).astype(np.float32)
        mp = np.concatenate([model, noise_m])
        sp = np.concatenate([scene, noise_s])
        centroid = jnp.asarray(model.mean(0))
        res = hough3d_grouping(
            jnp.asarray(mp), jnp.asarray(sp), jnp.ones(len(mp), bool),
            centroid, bin_size=0.1, threshold=5, max_instances=2,
        )
        assert bool(res.instances[0])
        members = np.asarray(res.members[0])
        assert members[:25].mean() > 0.9
        T = np.asarray(res.transforms[0])
        np.testing.assert_allclose(T[:3, 3], t, atol=0.05)


class TestVerification:
    def test_accepts_true_rejects_false(self, rng):
        model = rng.normal(size=(100, 3)).astype(np.float32) * 0.3
        T_true = np.asarray(tf.se3_exp(jnp.asarray([0.5, 0.2, -0.1, 0.1, 0.3, 0.2], jnp.float32)))
        scene = model @ T_true[:3, :3].T + T_true[:3, 3]
        T_false = T_true.copy()
        T_false[:3, 3] += 2.0
        Ts = jnp.asarray(np.stack([T_true, T_false]).astype(np.float32))
        accept = greedy_hypothesis_verification(
            jnp.asarray(model), Ts, jnp.ones(2, bool),
            jnp.asarray(scene), jnp.ones(len(scene), bool),
            inlier_threshold=0.02,
        )
        assert bool(accept[0]) and not bool(accept[1])


class TestGlobalHV:
    def test_selects_true_hypotheses(self, rng):
        """Scene = two model instances; 4 hypotheses (2 true, 1 duplicate of
        a true pose, 1 bogus). The global optimization must keep exactly the
        two true ones (reference capability: hv/hv_go.h)."""
        import jax.numpy as jnp
        from pcl_tpu.core.transforms import se3_exp
        from pcl_tpu.recognition.verification import global_hypothesis_verification

        model = rng.uniform(-0.1, 0.1, size=(80, 3)).astype(np.float32)
        T1 = np.eye(4, dtype=np.float32); T1[:3, 3] = [0.5, 0, 0]
        T2 = np.eye(4, dtype=np.float32); T2[:3, 3] = [-0.5, 0.2, 0]
        scene = np.concatenate([
            model @ T1[:3, :3].T + T1[:3, 3],
            model @ T2[:3, :3].T + T2[:3, 3],
        ]).astype(np.float32)
        scene += rng.normal(scale=0.002, size=scene.shape).astype(np.float32)
        # duplicate of T1 slightly off, plus a far-away bogus pose
        T1b = T1.copy(); T1b[:3, 3] += [0.004, 0, 0]
        T3 = np.eye(4, dtype=np.float32); T3[:3, 3] = [3.0, 3.0, 0]
        transforms = jnp.asarray(np.stack([T1, T2, T1b, T3]))
        ok = jnp.ones((4,), bool)
        accept = global_hypothesis_verification(
            jnp.asarray(model), transforms, ok,
            jnp.asarray(scene), jnp.ones((scene.shape[0],), bool),
            inlier_threshold=0.02)
        a = np.asarray(accept)
        assert a[0] and a[1], a          # both true instances kept
        assert not a[3], a               # bogus rejected
        assert not (a[0] and a[2]), a    # duplicate suppressed


class TestDualSVM:
    def test_rbf_ring(self, rng):
        """Nonlinearly separable ring vs blob — the dual QP solver must
        reach the libsvm-level solution (reference svm_wrapper.h)."""
        import jax.numpy as jnp
        from pcl_tpu.ml.svm import svm_train_dual, svm_classify_dual
        n = 150
        blob = rng.normal(size=(n, 2)) * 0.3
        ang = rng.uniform(0, 2 * np.pi, n)
        ring = np.stack([np.cos(ang), np.sin(ang)], 1) * 2.0 \
            + rng.normal(size=(n, 2)) * 0.2
        x = np.concatenate([blob, ring]).astype(np.float32)
        y = np.concatenate([np.ones(n), -np.ones(n)]).astype(np.float32)
        m = svm_train_dual(jnp.asarray(x), jnp.asarray(y),
                           kernel="rbf", C=10.0, gamma=1.0)
        pred = np.sign(np.asarray(svm_classify_dual(m, jnp.asarray(x))))
        assert (pred == y).mean() > 0.97
        # KKT sanity: dual variables inside the box (bias-augmented dual
        # has no y'a=0 constraint; b = y'a by construction)
        alpha = np.asarray(m.w) * y
        assert alpha.min() >= -1e-5 and alpha.max() <= 10.0 + 1e-4
        np.testing.assert_allclose(float(m.b), np.dot(y, alpha), rtol=1e-4)

    def test_linear_matches_primal(self, rng):
        import jax.numpy as jnp
        from pcl_tpu.ml.svm import (svm_train, svm_classify,
                                    svm_train_dual, svm_classify_dual)
        n = 100
        x = rng.normal(size=(2 * n, 2)).astype(np.float32)
        y = np.where(x[:, 0] + 0.5 * x[:, 1] > 0.1, 1.0, -1.0).astype(np.float32)
        mp = svm_train(jnp.asarray(x), jnp.asarray(y), kernel="linear", C=5.0)
        md = svm_train_dual(jnp.asarray(x), jnp.asarray(y), kernel="linear", C=5.0)
        pp = np.sign(np.asarray(svm_classify(mp, jnp.asarray(x))))
        pd = np.sign(np.asarray(svm_classify_dual(md, jnp.asarray(x))))
        assert (pp == y).mean() > 0.95
        assert (pd == y).mean() > 0.95
