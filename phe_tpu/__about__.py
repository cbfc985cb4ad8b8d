"""Package metadata."""

__title__ = "phe_tpu"
__version__ = "0.1.0"
__summary__ = (
    "TPU-native partially homomorphic encryption (Paillier) framework: "
    "batched big-integer Montgomery arithmetic as JAX/XLA/Pallas programs."
)
__license__ = "GPLv3"
