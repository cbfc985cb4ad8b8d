"""phe_tpu: a TPU-native Paillier partially-homomorphic-encryption framework.

Capability parity with data61/python-paillier (the ``phe`` package), rebuilt
TPU-first: the scalar API below is a drop-in for ``phe`` (reference surface:
phe/__init__.py:1-13), while the batch-first device API in
:mod:`phe_tpu.batch` and the mesh-parallel layer in :mod:`phe_tpu.parallel`
carry ciphertext batches as limb tensors through Montgomery-arithmetic
XLA/Pallas programs.
"""

from phe_tpu import utils  # noqa: F401
from phe_tpu.encoding import EncodedNumber
from phe_tpu.encrypted import EncryptedNumber
from phe_tpu.keys import (
    DEFAULT_KEYSIZE,
    PaillierPrivateKey,
    PaillierPrivateKeyring,
    PaillierPublicKey,
    generate_paillier_keypair,
)

__all__ = [
    "EncodedNumber",
    "EncryptedNumber",
    "PaillierPrivateKey",
    "PaillierPrivateKeyring",
    "PaillierPublicKey",
    "generate_paillier_keypair",
    "DEFAULT_KEYSIZE",
]

try:
    from phe_tpu import cli  # noqa: F401
except ImportError:
    pass
