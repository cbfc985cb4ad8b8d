"""EncryptedBatch: the TPU batch engine vs the scalar API and reference semantics.

Covers the behavioural contract of SURVEY.md §7 as it applies to batched
operation: bit-exact raw encryption with pinned r (phe/tests/paillier_test.py
:128-142 vectors), homomorphic algebra, exponent alignment, the lazy
obfuscation state machine, and interop with the scalar EncryptedNumber API.
"""

import numpy as np
import pytest

import phe_tpu
from phe_tpu.batch import EncryptedBatch
from phe_tpu.encoding import EncodedNumber

# On-hardware lane subset: PHE_TPU_TEST_PLATFORM=tpu pytest -m hardware_smoke
pytestmark = pytest.mark.hardware_smoke


@pytest.fixture(scope="module")
def keypair():
    return phe_tpu.generate_paillier_keypair(n_length=256)


VALUES = [0, 1, -1, 3.14159, -2.5e-3, 1 << 60, -(1 << 40), 0.0, 17, -9999.25]


class TestEncryptDecrypt:
    def test_roundtrip(self, keypair):
        pub, priv = keypair
        batch = EncryptedBatch.encrypt(pub, VALUES)
        out = batch.decrypt(priv)
        assert out == VALUES

    def test_fast_decode_matches_exact(self, keypair):
        # The compact device decode (batch._decode_compact + ldexp) must
        # agree bit-for-bit with the exact bigint Encoding.decode on every
        # edge the windows/rounding analysis covers: subnormals, >2^53
        # mantissas (single-rounding equivalence), >=2^64 mantissas and
        # huge ints (device fallback), ties, and negatives.
        pub, priv = keypair
        vals = [
            2.0**-1040,            # subnormal result, mantissa <= 2^53
            -(2.0**-1060),
            1e-300, -1e300,
            float((1 << 60) + 1),  # > 2^53 mantissa from an int-valued float
            (1 << 200),            # int mantissa >= 2^64: fallback row
            -(1 << 200) - 12345,
            1, -1, 0, 17,
            0.1, -3.14159e-20, 2.5, -2.5,
        ]
        batch = EncryptedBatch.encrypt(pub, vals)
        got = batch.decrypt(priv)
        residues = priv.device_context().raw_decrypt_batch(batch.mont)
        want = [
            EncodedNumber(pub, m, int(e)).decode()
            for m, e in zip(residues[: len(vals)], batch.exponents)
        ]
        assert got == want
        assert got == vals

    def test_fast_decode_mixed_hard_rows_order(self, keypair):
        # Fallback rows interleaved with fast rows keep their positions.
        pub, priv = keypair
        vals = [1.5, (1 << 100), -2.25, -(1 << 90), 7]
        got = EncryptedBatch.encrypt(pub, vals).decrypt(priv)
        assert got == vals

    def test_decode_overflow_window_raises(self, keypair):
        # A residue in the dead zone must still raise OverflowError
        # through the fast path (it lands on the exact-decode fallback).
        pub, priv = keypair
        bad = pub.max_int + 1  # inside (max_int, n - max_int)
        batch = EncryptedBatch.encrypt(pub, [EncodedNumber(pub, bad, 0)])
        with pytest.raises(OverflowError):
            batch.decrypt(priv)

    def test_roundtrip_unobfuscated(self, keypair):
        pub, priv = keypair
        batch = EncryptedBatch.encrypt(pub, VALUES, obfuscation="none")
        assert not batch.is_obfuscated
        assert batch.decrypt(priv) == VALUES

    def test_roundtrip_short_obfuscation(self, keypair):
        pub, priv = keypair
        batch = EncryptedBatch.encrypt(pub, VALUES, obfuscation="short")
        assert batch.is_obfuscated
        assert batch.decrypt(priv) == VALUES

    def test_bit_exact_vs_scalar_raw_encrypt(self, keypair):
        pub, _ = keypair
        rs = [3, 7, 12345, pub.n - 2]
        ms = [1, 2, 10100, pub.n - 1]
        batch = EncryptedBatch.encrypt(
            pub,
            [EncodedNumber(pub, m, 0) for m in ms],
            r_values=rs,
        )
        got = batch.ciphertext_ints(be_secure=False)
        want = [pub.raw_encrypt(m, r_value=r) for m, r in zip(ms, rs)]
        assert got == want

    def test_reference_regression_vector(self):
        # phe/tests/paillier_test.py:128-142: n=126869, m=10100, r=74384.
        pub = phe_tpu.PaillierPublicKey(126869)
        batch = EncryptedBatch.encrypt(
            pub, [EncodedNumber(pub, 10100, 0)], r_values=[74384]
        )
        assert batch.ciphertext_ints(be_secure=False) == [935906717]

    def test_semantic_security(self, keypair):
        pub, _ = keypair
        a = EncryptedBatch.encrypt(pub, [42.0])
        b = EncryptedBatch.encrypt(pub, [42.0])
        assert a.ciphertext_ints(False) != b.ciphertext_ints(False)

    def test_wrong_key_decrypt_raises(self, keypair):
        pub, _ = keypair
        other_pub, other_priv = phe_tpu.generate_paillier_keypair(n_length=256)
        batch = EncryptedBatch.encrypt(pub, [1.0])
        with pytest.raises(ValueError):
            batch.decrypt(other_priv)


class TestAlgebra:
    def test_add_encrypted(self, keypair):
        pub, priv = keypair
        a_vals = [1.5, -2.0, 300.0, 1e-5, 7]
        b_vals = [2.25, 2.0, -0.5, 1e5, -3]
        a = EncryptedBatch.encrypt(pub, a_vals)
        b = EncryptedBatch.encrypt(pub, b_vals)
        out = (a + b).decrypt(priv)
        np.testing.assert_allclose(
            out, [x + y for x, y in zip(a_vals, b_vals)], rtol=1e-12
        )

    def test_add_scalars(self, keypair):
        pub, priv = keypair
        a_vals = [1.5, -2.0, 300.0, 0.0]
        s_vals = [4, -0.5, 1e-3, 12.125]
        a = EncryptedBatch.encrypt(pub, a_vals)
        out = (a + s_vals).decrypt(priv)
        np.testing.assert_allclose(
            out, [x + y for x, y in zip(a_vals, s_vals)], rtol=1e-12
        )

    def test_add_broadcast_scalar(self, keypair):
        pub, priv = keypair
        a = EncryptedBatch.encrypt(pub, [1.0, 2.0, 3.0])
        out = (a + 10).decrypt(priv)
        assert out == [11.0, 12.0, 13.0]

    def test_radd(self, keypair):
        pub, priv = keypair
        a = EncryptedBatch.encrypt(pub, [1.0, 2.0])
        out = ([5, 6] + a).decrypt(priv)
        assert out == [6.0, 8.0]

    def test_sub(self, keypair):
        pub, priv = keypair
        a = EncryptedBatch.encrypt(pub, [10.0, 5.5])
        b = EncryptedBatch.encrypt(pub, [4.0, 0.5])
        assert (a - b).decrypt(priv) == [6.0, 5.0]
        assert (a - [1, 1]).decrypt(priv) == [9.0, 4.5]

    def test_mul_scalars(self, keypair):
        pub, priv = keypair
        a_vals = [1.5, -2.0, 300.0, 1e-4]
        s_vals = [2, -3.5, 0.25, 10000]
        a = EncryptedBatch.encrypt(pub, a_vals)
        out = a.mul_scalars(s_vals).decrypt(priv)
        np.testing.assert_allclose(
            out, [x * y for x, y in zip(a_vals, s_vals)], rtol=1e-12
        )

    def test_mul_operator_and_rmul(self, keypair):
        pub, priv = keypair
        a = EncryptedBatch.encrypt(pub, [3.0, -4.0])
        assert (a * 2).decrypt(priv) == [6.0, -8.0]
        assert (2 * a).decrypt(priv) == [6.0, -8.0]

    def test_mixed_exponent_alignment(self, keypair):
        pub, priv = keypair
        # ints encode at exponent 0, floats at negative exponents: the add
        # must align per element (phe/paillier.py:664-669).
        a = EncryptedBatch.encrypt(pub, [1, 2.5, 3])
        b = EncryptedBatch.encrypt(pub, [0.25, 4, -1.125])
        out = (a + b).decrypt(priv)
        assert out == [1.25, 6.5, 1.875]

    def test_add_different_keys_raises(self, keypair):
        pub, _ = keypair
        pub2, _ = phe_tpu.generate_paillier_keypair(n_length=256)
        a = EncryptedBatch.encrypt(pub, [1.0])
        b = EncryptedBatch.encrypt(pub2, [1.0])
        with pytest.raises(ValueError):
            a + b

    def test_sum(self, keypair):
        pub, priv = keypair
        vals = [1.5, 2.25, -0.75, 4.0, 10.0, -3.5, 0.125]
        batch = EncryptedBatch.encrypt(pub, vals)
        total = batch.sum()
        assert len(total) == 1
        np.testing.assert_allclose(total.decrypt(priv), [sum(vals)], rtol=1e-12)

    def test_dot(self, keypair):
        pub, priv = keypair
        x = [1.5, -2.0, 3.25, 0.5]
        w = [0.1, 0.2, -0.3, 4.0]
        enc = EncryptedBatch.encrypt(pub, x)
        out = enc.dot(w).decrypt(priv)
        np.testing.assert_allclose(out, [float(np.dot(x, w))], rtol=1e-12)

    def test_decrease_exponent_to(self, keypair):
        pub, priv = keypair
        batch = EncryptedBatch.encrypt(pub, [3.14, 2])
        lowered = batch.decrease_exponent_to(-20)
        assert (lowered.exponents == -20).all()
        np.testing.assert_allclose(lowered.decrypt(priv), [3.14, 2], rtol=1e-12)

    def test_decrease_exponent_rejects_increase(self, keypair):
        pub, _ = keypair
        batch = EncryptedBatch.encrypt(pub, [3.14])
        with pytest.raises(ValueError):
            batch.decrease_exponent_to(batch.exponents + 1)


class TestObfuscationStateMachine:
    def test_fresh_encrypt_obfuscated(self, keypair):
        pub, _ = keypair
        assert EncryptedBatch.encrypt(pub, [1.0]).is_obfuscated

    def test_add_result_not_obfuscated(self, keypair):
        pub, _ = keypair
        a = EncryptedBatch.encrypt(pub, [1.0])
        b = EncryptedBatch.encrypt(pub, [2.0])
        assert not (a + b).is_obfuscated
        assert not (a * 2).is_obfuscated

    def test_secure_export_obfuscates(self, keypair):
        pub, priv = keypair
        a = EncryptedBatch.encrypt(pub, [1.0], obfuscation="none")
        insecure = a.ciphertext_ints(be_secure=False)
        secure = a.ciphertext_ints(be_secure=True)
        assert insecure != secure

    def test_secure_export_persists(self, keypair):
        # First secure read obfuscates AND sticks (phe/paillier.py:531-568):
        # later exports, secure or not, see the same ciphertexts.
        pub, priv = keypair
        a = EncryptedBatch.encrypt(pub, [1.0], obfuscation="none")
        first = a.ciphertext_ints(be_secure=True)
        assert a.is_obfuscated
        assert a.ciphertext_ints(be_secure=True) == first
        assert a.ciphertext_ints(be_secure=False) == first
        assert a.decrypt(priv) == [1.0]

    def test_obfuscate_preserves_plaintext(self, keypair):
        pub, priv = keypair
        a = EncryptedBatch.encrypt(pub, VALUES)
        b = a.obfuscate()
        assert b.is_obfuscated
        assert a.ciphertext_ints(False) != b.ciphertext_ints(False)
        assert b.decrypt(priv) == VALUES


class TestScalarInterop:
    def test_to_encrypted_numbers(self, keypair):
        pub, priv = keypair
        batch = EncryptedBatch.encrypt(pub, VALUES)
        numbers = batch.to_encrypted_numbers(be_secure=False)
        assert [priv.decrypt(e) for e in numbers] == VALUES

    def test_from_encrypted_numbers(self, keypair):
        pub, priv = keypair
        numbers = [pub.encrypt(v) for v in VALUES]
        batch = EncryptedBatch.from_encrypted_numbers(numbers)
        assert batch.decrypt(priv) == VALUES

    def test_mixed_pipeline(self, keypair):
        # Scalar-encrypted inputs, batched compute, scalar decrypt.
        pub, priv = keypair
        numbers = [pub.encrypt(v) for v in [1.0, 2.0, 3.0]]
        batch = EncryptedBatch.from_encrypted_numbers(numbers)
        result = (batch * 2 + [1, 1, 1]).to_encrypted_numbers()
        assert [priv.decrypt(e) for e in result] == [3.0, 5.0, 7.0]

    def test_import_raw_ciphertexts(self, keypair):
        pub, priv = keypair
        scalar = pub.encrypt(123.456)
        batch = EncryptedBatch.from_ciphertext_ints(
            pub, [scalar.ciphertext(False)], [scalar.exponent]
        )
        assert batch.decrypt(priv) == [123.456]


class TestAltBase:
    def test_base64_encoding_class(self, keypair):
        # examples/alternative_base.py: BASE=64 subclass flows through the
        # batched decrypt's Encoding hook.
        pub, priv = keypair

        class Base64Number(EncodedNumber):
            BASE = 64
            import math as _math

            LOG2_BASE = _math.log(BASE, 2)

        vals = [2.5, -17.0, 0.078125]
        encodings = [Base64Number.encode(pub, v) for v in vals]
        batch = EncryptedBatch.encrypt(pub, encodings)
        out = batch.decrypt(priv, Encoding=Base64Number)
        assert out == vals


class TestStreamingDecrypt:
    def test_decrypt_async_matches_decrypt(self, keypair):
        # decrypt() is decrypt_async()(); several in-flight finishers
        # must drain correctly in any order (the bench/serving pattern).
        pub, priv = keypair
        batches = [
            EncryptedBatch.encrypt(pub, [float(i), -2.5 * i, i + 0.0625])
            for i in range(1, 4)
        ]
        finishers = [b.decrypt_async(priv) for b in batches]
        outs = [f() for f in reversed(finishers)]
        assert outs == [
            [float(i), -2.5 * i, i + 0.0625] for i in reversed(range(1, 4))
        ]

    def test_decrypt_async_exact_path(self, keypair):
        # Custom Encoding classes ride the exact bigint finisher.
        pub, priv = keypair

        class Base64Encoded(EncodedNumber):
            BASE = 64
            LOG2_BASE = 6

        enc = [Base64Encoded.encode(pub, v) for v in [1.5, -300.25, 1e-4]]
        ct = EncryptedBatch.encrypt(pub, enc)
        fin = ct.decrypt_async(priv, Encoding=Base64Encoded)
        assert fin() == [1.5, -300.25, 1e-4]

    def test_decrypt_async_wrong_key_raises(self, keypair):
        pub, priv = keypair
        pub2, priv2 = phe_tpu.generate_paillier_keypair(n_length=256)
        ct = EncryptedBatch.encrypt(pub, [1.0])
        with pytest.raises(ValueError):
            ct.decrypt_async(priv2)


class TestChunkedInverse:
    def test_chunked_batch_inversion(self, keypair, monkeypatch):
        # The batch-inversion scan runs per fixed-size chunk (compile-
        # shape pinning); force multi-chunk at a tiny size and check the
        # negative-scalar path still matches plain arithmetic and the
        # single-chunk result.
        pub, priv = keypair
        vals = [float(v) for v in range(1, 11)]
        scal = [(-1.0) ** i * (i + 0.5) for i in range(10)]
        ct = EncryptedBatch.encrypt(pub, vals)
        monkeypatch.setattr(EncryptedBatch, "_INVERSE_CHUNK", 4)
        got = (ct * scal).decrypt(priv)
        assert got == [a * b for a, b in zip(vals, scal)]
        inv_chunked = np.asarray(ct.inverse_mont())
        ct2 = EncryptedBatch.encrypt(
            pub, vals, r_values=[3] * 10
        )
        # independent single-chunk reference on identical ciphertexts
        monkeypatch.setattr(EncryptedBatch, "_INVERSE_CHUNK", 1 << 20)
        ct3 = EncryptedBatch.encrypt(pub, vals, r_values=[3] * 10)
        a = np.asarray(ct2.inverse_mont())
        b = np.asarray(ct3.inverse_mont())
        assert (a == b).all()
