"""Host number-theory layer: parity with phe/util.py semantics.

Mirrors the reference's util_test.py coverage (SURVEY.md §4): powmod/invert/
getprimeover/isqrt, EEA, Miller-Rabin and is_prime edge cases, base64
roundtrips.
"""

import math

import pytest

from phe_tpu.utils import b64, limbs, ntheory


class TestPowmodInvert:
    def test_powmod_small(self):
        assert ntheory.powmod(3, 5, 7) == pow(3, 5, 7)
        assert ntheory.powmod(2, 0, 5) == 1

    def test_powmod_one_base(self):
        # Reference short-circuits a == 1 to literal 1 (phe/util.py:45-46).
        assert ntheory.powmod(1, 100, 1) == 1

    def test_powmod_large(self):
        a = 2**1024 + 12345
        b = 2**512 + 7
        c = 2**2048 - 159
        assert ntheory.powmod(a, b, c) == pow(a, b, c)

    def test_mulmod(self):
        assert ntheory.mulmod(2**600, 2**600, 2**1000 + 7) == (
            2**1200 % (2**1000 + 7)
        )

    def test_invert(self):
        p = 101
        for a in range(1, p):
            inv = ntheory.invert(a, p)
            assert a * inv % p == 1

    def test_invert_no_inverse_raises(self):
        with pytest.raises(ZeroDivisionError):
            ntheory.invert(6, 9)

    def test_extended_euclid(self):
        for a, b in [(240, 46), (7, 13), (2**64, 3**40), (1, 1)]:
            g, x, y = ntheory.extended_euclidean_algorithm(a, b)
            assert g == math.gcd(a, b)
            assert x * a + y * b == g


class TestPrimes:
    def test_first_primes_match_reference_table_extent(self):
        # Reference hardcodes primes below 17881 (phe/util.py:195-378).
        assert ntheory.first_primes[0] == 2
        assert ntheory.first_primes[-1] == 17863
        assert len(ntheory.first_primes) == 2048

    def test_is_prime_small(self):
        assert not ntheory.is_prime(0)
        assert not ntheory.is_prime(1)
        assert ntheory.is_prime(2)
        assert ntheory.is_prime(3)
        assert not ntheory.is_prime(4)
        assert ntheory.is_prime(17863)
        assert not ntheory.is_prime(17864)
        assert ntheory.is_prime(17881)

    def test_is_prime_known_large(self):
        assert ntheory.is_prime(2**127 - 1)  # Mersenne prime
        assert not ntheory.is_prime(2**128 + 1)
        assert not ntheory.is_prime((2**61 - 1) * (2**31 - 1))

    def test_miller_rabin_composites(self):
        # Carmichael numbers must be rejected.
        for n in [561, 1105, 1729, 2465, 75361]:
            assert not ntheory.miller_rabin(n, 25)

    @pytest.mark.parametrize("bits", [16, 64, 128, 256])
    def test_getprimeover_bit_length(self, bits):
        p = ntheory.getprimeover(bits)
        assert p.bit_length() == bits
        assert ntheory.is_prime(p)

    def test_isqrt(self):
        for n in [0, 1, 2, 3, 4, 15, 16, 17, 2**100, 2**100 + 1]:
            r = ntheory.isqrt(n)
            assert r * r <= n < (r + 1) * (r + 1)


class TestBase64:
    def test_roundtrip(self):
        for v in [1, 255, 256, 2**64, 2**2048 - 1, 0x0100]:
            assert b64.base64_to_int(b64.int_to_base64(v)) == v

    def test_zero_asserts(self):
        with pytest.raises(AssertionError):
            b64.int_to_base64(0)

    def test_invalid_length_raises(self):
        with pytest.raises(ValueError):
            b64.base64url_decode("abcde")

    def test_known_value(self):
        # 0x010001 == AQAB, the classic JWK RSA exponent encoding.
        assert b64.int_to_base64(65537) == "AQAB"
        assert b64.base64_to_int("AQAB") == 65537


class TestLimbPacking:
    def test_roundtrip_random(self):
        import random as _r

        rng = _r.Random(42)
        values = [rng.getrandbits(4096) for _ in range(17)] + [0, 1, 2**15, 2**15 - 1]
        L = limbs.num_limbs_for_bits(4096)
        arr = limbs.ints_to_limbs(values, L)
        assert arr.shape == (len(values), L)
        assert (arr <= limbs.LIMB_MASK).all()
        assert limbs.limbs_to_ints(arr) == values

    def test_redundant_limbs_exact(self):
        import numpy as np

        B = limbs.LIMB_BITS
        arr = np.array([[2**B, 2**B, 5]], dtype=np.uint32)
        expected = 2**B + (2**B << B) + (5 << (2 * B))
        assert limbs.limbs_to_ints(arr) == [expected]

    def test_overflow_raises(self):
        with pytest.raises(ValueError):
            limbs.ints_to_limbs([2**31], 2)
