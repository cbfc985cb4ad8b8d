"""Model families: privacy-preserving ML protocols on the batch engine.

The reference ships these as stand-alone example scripts
(examples/federated_learning_with_encryption.py,
examples/logistic_regression_encrypted_model.py); here they are library
components built on EncryptedBatch, with the aggregation reduce optionally
sharded over a device mesh.
"""

from phe_tpu.models.federated import (
    FederatedClient,
    FederatedServer,
    aggregate_encrypted_gradients,
    run_federated_learning,
)
from phe_tpu.models.logreg import EncryptedScorer, train_spam_classifier

__all__ = [
    "FederatedClient",
    "FederatedServer",
    "aggregate_encrypted_gradients",
    "run_federated_learning",
    "EncryptedScorer",
    "train_spam_classifier",
]
