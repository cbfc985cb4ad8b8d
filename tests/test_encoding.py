"""Encoding layer: fixed-point semantics, sign windows, alternative bases.

Mirrors the reference's encoding coverage including the subclass-parameterised
alt-base suites (phe/tests/paillier_test.py:388-427, BASE 64 / 2 / 13) and the
precision semantics (:315-385).
"""

import math
import sys

import pytest

from phe_tpu import EncodedNumber, PaillierPublicKey, generate_paillier_keypair


@pytest.fixture(scope="module")
def keypair():
    return generate_paillier_keypair(n_length=256)


class Base64Number(EncodedNumber):
    BASE = 64
    LOG2_BASE = math.log(BASE, 2)


class Base2Number(EncodedNumber):
    BASE = 2
    LOG2_BASE = math.log(BASE, 2)


class Base13Number(EncodedNumber):
    BASE = 13
    LOG2_BASE = math.log(BASE, 2)


ALL_BASES = [EncodedNumber, Base64Number, Base2Number, Base13Number]


@pytest.mark.parametrize("Enc", ALL_BASES)
class TestEncodeDecodeAllBases:
    def test_int_roundtrip(self, keypair, Enc):
        pub, _ = keypair
        for v in [0, 1, -1, 42, -42, 2**62, -(2**62), pub.max_int, -pub.max_int]:
            enc = Enc.encode(pub, v)
            assert enc.exponent <= 0
            assert enc.decode() == v

    def test_int_exponent_is_zero(self, keypair, Enc):
        pub, _ = keypair
        assert Enc.encode(pub, 123).exponent == 0

    def test_float_roundtrip(self, keypair, Enc):
        pub, _ = keypair
        for v in [0.0, 1.0, -1.0, 0.1, -0.1, math.pi, 1e-12, 1e12, 2.0**-52]:
            assert Enc.encode(pub, v).decode() == v

    def test_negative_wraps_mod_n(self, keypair, Enc):
        pub, _ = keypair
        enc = Enc.encode(pub, -1)
        assert enc.encoding == pub.n - Enc.BASE ** -enc.exponent * 1 or (
            enc.encoding < pub.n and enc.decode() == -1
        )

    def test_decrease_exponent_preserves_value(self, keypair, Enc):
        pub, _ = keypair
        enc = Enc.encode(pub, 3.5)
        lower = enc.decrease_exponent_to(enc.exponent - 5)
        assert lower.exponent == enc.exponent - 5
        assert lower.decode() == 3.5

    def test_decrease_exponent_upwards_raises(self, keypair, Enc):
        pub, _ = keypair
        enc = Enc.encode(pub, 3.5)
        with pytest.raises(ValueError):
            enc.decrease_exponent_to(enc.exponent + 1)


class TestSignWindows:
    def test_decode_corrupted_raises(self, keypair):
        pub, _ = keypair
        with pytest.raises(ValueError):
            EncodedNumber(pub, pub.n, 0).decode()

    def test_decode_overflow_window_raises(self, keypair):
        pub, _ = keypair
        with pytest.raises(OverflowError):
            EncodedNumber(pub, pub.max_int + 1, 0).decode()
        with pytest.raises(OverflowError):
            EncodedNumber(pub, pub.n - pub.max_int - 1, 0).decode()

    def test_window_edges(self, keypair):
        pub, _ = keypair
        assert EncodedNumber(pub, pub.max_int, 0).decode() == pub.max_int
        assert EncodedNumber(pub, pub.n - pub.max_int, 0).decode() == -pub.max_int
        assert EncodedNumber(pub, pub.n - 1, 0).decode() == -1

    def test_encode_out_of_range_raises(self, keypair):
        pub, _ = keypair
        with pytest.raises(ValueError):
            EncodedNumber.encode(pub, pub.max_int + 1)
        with pytest.raises(ValueError):
            EncodedNumber.encode(pub, -pub.max_int - 1)

    def test_encode_bad_type_raises(self, keypair):
        pub, _ = keypair
        with pytest.raises(TypeError):
            EncodedNumber.encode(pub, "3.14")
        with pytest.raises(TypeError):
            EncodedNumber.encode(pub, complex(1, 2))


class TestPrecisionSemantics:
    def test_manual_precision(self, keypair):
        # phe/tests/paillier_test.py:315-361 analogue.
        pub, _ = keypair
        v = 3.171234e-7
        prec = 1e-8
        enc = EncodedNumber.encode(pub, v, precision=prec)
        assert abs(enc.decode() - v) <= prec

    def test_automatic_precision_is_float_exact(self, keypair):
        pub, _ = keypair
        for v in [0.1, 1e100, 1e-100, math.e]:
            assert EncodedNumber.encode(pub, v).decode() == v

    def test_max_exponent_clamps(self, keypair):
        pub, _ = keypair
        enc = EncodedNumber.encode(pub, 1.25, max_exponent=-10)
        assert enc.exponent <= -10
        assert enc.decode() == 1.25

    def test_precision_rounds_value(self, keypair):
        pub, _ = keypair
        enc = EncodedNumber.encode(pub, 3.14159, precision=0.01)
        assert enc.decode() != 3.14159
        assert abs(enc.decode() - 3.14159) <= 0.01

    def test_frexp_exponent_choice_base16(self, keypair):
        # The exponent must be floor((frexp_exp - 53) / 4) for BASE=16.
        pub, _ = keypair
        v = 1.0
        enc = EncodedNumber.encode(pub, v)
        expected = math.floor((math.frexp(v)[1] - sys.float_info.mant_dig) / 4)
        assert enc.exponent == expected

    def test_arbitrary_precision_accumulation(self, keypair):
        # phe/tests/paillier_test.py:698-721: encoded arithmetic can beat
        # float64 accumulation.
        pub, priv_ = keypair
        one_third = EncodedNumber.encode(pub, 1 / 3, precision=1e-35)
        assert one_third.decode() == 1 / 3


class TestBooleanScalars:
    def test_bool_encodes_as_int(self, keypair):
        # bool is an int subclass; reference treats it as exponent-0 int.
        pub, _ = keypair
        enc = EncodedNumber.encode(pub, True)
        assert enc.exponent == 0
        assert enc.decode() == 1


class TestEncodeMany:
    def test_matches_scalar_encode_bitwise(self, keypair):
        pub, _ = keypair
        values = [0.0, 1.0, -1.0, 3.141592653589793, -2.5e-12, 1e200,
                  -0.1, 123, -456, 2**40 + 1, 0.5, 2.0**-1060]
        fast = EncodedNumber.encode_many(pub, values)
        slow = [EncodedNumber.encode(pub, v) for v in values]
        for f, s, v in zip(fast, slow, values):
            assert (f.encoding, f.exponent) == (s.encoding, s.exponent), v

    def test_odd_base_falls_back_to_exact_path(self, keypair):
        pub, _ = keypair

        class Base13(EncodedNumber):
            BASE = 13
            LOG2_BASE = math.log(13, 2)

        values = [1.25, -7.75, 1e-3]
        fast = Base13.encode_many(pub, values)
        slow = [Base13.encode(pub, v) for v in values]
        for f, s in zip(fast, slow):
            assert (f.encoding, f.exponent) == (s.encoding, s.exponent)
