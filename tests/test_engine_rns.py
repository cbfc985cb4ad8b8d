"""Force the RNS engine lane on CPU: full-pipeline bit-exactness.

PHE_TPU_ENGINE=rns routes the shared-exponent modexps (encryption
obfuscator, CRT decrypt powers) through phe_tpu.ops.rns; these tests pin
that the ciphertexts and plaintexts are bit-identical to the host-integer
scalar layer — same contract the default (limb-engine) lane is held to.
"""

import numpy as np
import pytest

import phe_tpu
from phe_tpu.batch import EncryptedBatch
from phe_tpu.encoding import EncodedNumber

# On-hardware lane subset: PHE_TPU_TEST_PLATFORM=tpu pytest -m hardware_smoke
pytestmark = pytest.mark.hardware_smoke


@pytest.fixture(autouse=True)
def _force_rns(monkeypatch):
    monkeypatch.setenv("PHE_TPU_ENGINE", "rns")
    # CPU run: keep the XLA reference twin (no Pallas interpret overhead).
    monkeypatch.setenv("PHE_TPU_RNS_KERNEL", "xla")


@pytest.fixture(scope="module")
def keypair():
    return phe_tpu.generate_paillier_keypair(n_length=256)


VALUES = [0, 1, -1, 3.14159, -2.5e-3, 1 << 60, 17.5]


def test_encrypt_bit_exact_vs_scalar(keypair):
    pub, _ = keypair
    rs = [3, 7, 12345, pub.n - 2]
    ms = [1, 2, 10100, pub.n - 1]
    batch = EncryptedBatch.encrypt(
        pub, [EncodedNumber(pub, m, 0) for m in ms], r_values=rs
    )
    got = batch.ciphertext_ints(be_secure=False)
    want = [pub.raw_encrypt(m, r_value=r) for m, r in zip(ms, rs)]
    assert got == want


def test_roundtrip_fresh(keypair):
    pub, priv = keypair
    batch = EncryptedBatch.encrypt(pub, VALUES)
    assert batch.decrypt(priv) == VALUES


def test_obfuscate_and_secure_export(keypair):
    pub, priv = keypair
    batch = EncryptedBatch.encrypt(pub, VALUES, obfuscation="none")
    secure = batch.ciphertext_ints(be_secure=True)
    assert batch.is_obfuscated
    assert batch.decrypt(priv) == VALUES
    # Secure ciphertexts decrypt identically through the scalar layer.
    for c, e, v in zip(secure, batch.exponents, VALUES):
        enc = phe_tpu.EncryptedNumber(pub, c, int(e))
        assert priv.decrypt(enc) == v


def test_decrypt_matches_scalar_layer(keypair):
    pub, priv = keypair
    scalars = [pub.encrypt(v) for v in VALUES]
    batch = EncryptedBatch.from_encrypted_numbers(scalars)
    assert batch.decrypt(priv) == VALUES


def test_algebra_through_rns_lane(keypair):
    pub, priv = keypair
    a = EncryptedBatch.encrypt(pub, VALUES)
    b = EncryptedBatch.encrypt(pub, [2.0] * len(VALUES))
    out = ((a + b) * 3.0).obfuscate().decrypt(priv)
    assert out == pytest.approx([(v + 2.0) * 3.0 for v in VALUES])


def test_reference_regression_vector():
    pub = phe_tpu.PaillierPublicKey(126869)
    batch = EncryptedBatch.encrypt(
        pub, [EncodedNumber(pub, 10100, 0)], r_values=[74384]
    )
    assert batch.ciphertext_ints(be_secure=False) == [935906717]
