"""Model-family protocols: federated aggregation and encrypted LR scoring.

These are the library versions of the reference's two flagship examples
(examples/federated_learning_with_encryption.py,
examples/logistic_regression_encrypted_model.py), checked for end-to-end
numeric correctness: encrypted compute must agree with the plaintext
computation to float precision, and federated training must actually
converge.
"""

import numpy as np
import pytest

import phe_tpu
from phe_tpu.batch import EncryptedBatch
from phe_tpu.models import (
    EncryptedScorer,
    aggregate_encrypted_gradients,
    run_federated_learning,
    train_spam_classifier,
)
from phe_tpu.models.logreg import score_roundtrip


@pytest.fixture(scope="module")
def keypair():
    return phe_tpu.generate_paillier_keypair(n_length=256)


class TestAggregation:
    def test_matches_plaintext_sum(self, keypair):
        pub, priv = keypair
        rng = np.random.default_rng(3)
        grads = rng.normal(size=(4, 6)).round(6)
        batches = [
            EncryptedBatch.encrypt(pub, [float(v) for v in g])
            for g in grads
        ]
        agg = aggregate_encrypted_gradients(batches)
        np.testing.assert_allclose(
            agg.decrypt(priv), grads.sum(axis=0), rtol=1e-10
        )

    def test_meshed_matches_local(self, keypair):
        from phe_tpu.parallel import batch_mesh

        pub, priv = keypair
        rng = np.random.default_rng(4)
        grads = rng.normal(size=(5, 3)).round(6)
        batches = [
            EncryptedBatch.encrypt(pub, [float(v) for v in g])
            for g in grads
        ]
        local = aggregate_encrypted_gradients(batches).decrypt(priv)
        meshed = aggregate_encrypted_gradients(
            batches, mesh=batch_mesh()
        ).decrypt(priv)
        assert local == meshed


class TestFederatedLearning:
    def test_converges(self):
        # Tiny config for CI: 3 clients, 256-bit key, synthetic data.
        rng = np.random.default_rng(0)
        w_true = np.array([1.0, -2.0, 0.5])
        X = rng.normal(size=(90, 3))
        y = X @ w_true + 0.01 * rng.normal(size=90)
        data = (
            np.array_split(X[:75], 3),
            np.array_split(y[:75], 3),
            X[75:],
            y[75:],
        )
        out = run_federated_learning(
            n_clients=3, n_iter=15, eta=1.0, key_length=256, data=data
        )
        assert out["mse"][-1] < 0.05
        assert out["mse"][-1] < out["mse"][0]


class TestEncryptedScoring:
    def test_matvec_matches_numpy(self, keypair):
        pub, priv = keypair
        rng = np.random.default_rng(5)
        w = rng.normal(size=4).round(4)
        X = rng.normal(size=(6, 4)).round(4)
        enc_w = EncryptedBatch.encrypt(pub, [float(v) for v in w])
        scores = enc_w.matvec(X).decrypt(priv)
        np.testing.assert_allclose(scores, X @ w, rtol=1e-10)

    def test_matvec_matches_mul_sum_mixed_signs(self, keypair):
        # matvec must equal the per-element mul + sum pipeline on
        # mixed-sign matrices — pins that the [B, D] grid takes the
        # inverse trick (short |mantissa| exponents, phe/paillier.py
        # :745-749) rather than paying ~n-bit residue exponents.
        pub, priv = keypair
        rng = np.random.default_rng(7)
        w_vals = [1.5, -0.25, 3.0, -2e-3]
        X = rng.normal(size=(3, 4)).round(3)  # negatives guaranteed
        enc_w = EncryptedBatch.encrypt(pub, w_vals)
        got = enc_w.matvec(X).decrypt(priv)
        want = [
            enc_w.mul_scalars([float(v) for v in row]).sum().decrypt(priv)[0]
            for row in X
        ]
        np.testing.assert_allclose(got, want, rtol=0, atol=0)
        np.testing.assert_allclose(got, X @ np.asarray(w_vals), rtol=1e-9)

    def test_scoring_matches_sklearn(self, keypair):
        pub, priv = keypair
        model, X_test, y_test = train_spam_classifier(
            n_samples=200, n_features=8
        )
        scorer = EncryptedScorer.from_model(
            pub, model.coef_, model.intercept_[0]
        )
        probs = score_roundtrip(priv, scorer, X_test[:10])
        expected = model.predict_proba(X_test[:10])[:, 1]
        np.testing.assert_allclose(probs, expected, rtol=1e-9)

    def test_bob_cannot_see_scores(self, keypair):
        # The encrypted scores Bob holds decrypt only with Alice's key.
        pub, priv = keypair
        other_pub, other_priv = phe_tpu.generate_paillier_keypair(
            n_length=256
        )
        scorer = EncryptedScorer.from_model(pub, [0.5, -0.25], 0.1)
        enc = scorer.encrypted_scores(np.array([[1.0, 2.0]]))
        with pytest.raises(ValueError):
            enc.decrypt(other_priv)
