"""Bit-exact parity against the actual reference library at /root/reference.

Imports the upstream ``phe`` package (read-only) and cross-checks ciphertexts,
encodings and decryptions between the two implementations on shared keys.
Skipped automatically when the reference checkout is unavailable.
"""

import random
import sys

import pytest

REFERENCE_PATH = "/root/reference"

phe = pytest.importorskip(
    "phe", reason="reference library not available"
) if REFERENCE_PATH in sys.path else None
if phe is None:
    sys.path.insert(0, REFERENCE_PATH)
    phe = pytest.importorskip("phe", reason="reference library not available")

import phe_tpu


@pytest.fixture(scope="module")
def shared_key():
    """One keypair instantiated in both libraries."""
    ref_pub, ref_priv = phe.generate_paillier_keypair(n_length=256)
    our_pub = phe_tpu.PaillierPublicKey(ref_pub.n)
    our_priv = phe_tpu.PaillierPrivateKey(our_pub, ref_priv.p, ref_priv.q)
    return ref_pub, ref_priv, our_pub, our_priv


class TestKeyParity:
    def test_derived_attributes(self, shared_key):
        ref_pub, ref_priv, our_pub, our_priv = shared_key
        assert our_pub.g == ref_pub.g
        assert our_pub.nsquare == ref_pub.nsquare
        assert our_pub.max_int == ref_pub.max_int
        assert our_priv.p == ref_priv.p
        assert our_priv.q == ref_priv.q
        assert our_priv.hp == ref_priv.hp
        assert our_priv.hq == ref_priv.hq
        assert our_priv.p_inverse == ref_priv.p_inverse


class TestCiphertextParity:
    def test_raw_encrypt_matches(self, shared_key):
        ref_pub, _, our_pub, _ = shared_key
        rng = random.Random(7)
        for _ in range(20):
            m = rng.randrange(0, ref_pub.n)
            r = rng.randrange(1, ref_pub.n)
            assert our_pub.raw_encrypt(m, r_value=r) == ref_pub.raw_encrypt(
                m, r_value=r
            )

    def test_encrypt_fixed_r_matches(self, shared_key):
        ref_pub, _, our_pub, _ = shared_key
        rng = random.Random(8)
        for v in [0, 1, -1, 12345, -9876, 3.14159, -2.71828, 1e-9, 1e9]:
            r = rng.randrange(1, ref_pub.n)
            ours = our_pub.encrypt(v, r_value=r)
            refs = ref_pub.encrypt(v, r_value=r)
            assert ours.ciphertext(False) == refs.ciphertext(False)
            assert ours.exponent == refs.exponent

    def test_cross_decrypt(self, shared_key):
        # Each library decrypts ciphertexts produced by the other.
        ref_pub, ref_priv, our_pub, our_priv = shared_key
        for v in [0, 7, -7, 0.5, -123.25, 1e-20]:
            ours = our_pub.encrypt(v)
            ref_enc = phe.EncryptedNumber(
                ref_pub, ours.ciphertext(True), ours.exponent
            )
            assert ref_priv.decrypt(ref_enc) == v

            refs = ref_pub.encrypt(v)
            our_enc = phe_tpu.EncryptedNumber(
                our_pub, refs.ciphertext(True), refs.exponent
            )
            assert our_priv.decrypt(our_enc) == v

    def test_algebra_matches_unobfuscated(self, shared_key):
        ref_pub, _, our_pub, _ = shared_key
        r1, r2 = 12345, 67890
        ours = (our_pub.encrypt(1.5, r_value=r1) + our_pub.encrypt(2.25, r_value=r2)) * 3
        refs = (ref_pub.encrypt(1.5, r_value=r1) + ref_pub.encrypt(2.25, r_value=r2)) * 3
        assert ours.ciphertext(False) == refs.ciphertext(False)
        assert ours.exponent == refs.exponent

    def test_raw_mul_negative_window_matches(self, shared_key):
        ref_pub, _, our_pub, _ = shared_key
        ours = our_pub.encrypt(42, r_value=1111) * -3
        refs = ref_pub.encrypt(42, r_value=1111) * -3
        assert ours.ciphertext(False) == refs.ciphertext(False)


class TestEncodingParity:
    def test_encodings_match(self, shared_key):
        ref_pub, _, our_pub, _ = shared_key
        rng = random.Random(9)
        values = [0, 1, -1, 3, 10**12, -(10**12)]
        values += [rng.uniform(-1e6, 1e6) for _ in range(20)]
        values += [rng.uniform(-1e-6, 1e-6) for _ in range(10)]
        for v in values:
            ours = phe_tpu.EncodedNumber.encode(our_pub, v)
            refs = phe.EncodedNumber.encode(ref_pub, v)
            assert ours.encoding == refs.encoding, v
            assert ours.exponent == refs.exponent, v

    def test_precision_encodings_match(self, shared_key):
        ref_pub, _, our_pub, _ = shared_key
        for v, p in [(3.14159, 0.01), (1e-8, 1e-10), (123456.789, 1.0)]:
            ours = phe_tpu.EncodedNumber.encode(our_pub, v, precision=p)
            refs = phe.EncodedNumber.encode(ref_pub, v, precision=p)
            assert ours.encoding == refs.encoding
            assert ours.exponent == refs.exponent
