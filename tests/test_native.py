"""Native C++ bignum backend: parity with CPython pow and dispatch rules.

Backend-equivalence testing in the spirit of the reference's
PaillierUtilFallbacksTest (phe/tests/util_test.py:62-75), which re-runs the
util suite with HAVE_GMP/HAVE_CRYPTO forced off: here we check the native
engine agrees bit-for-bit with the pure path it replaces.
"""

import random

import pytest

from phe_tpu.utils import ntheory as nt

pytestmark = pytest.mark.skipif(
    not nt.HAVE_NATIVE, reason="native backend unavailable"
)


def _random_odd(bits, rng):
    return rng.getrandbits(bits) | (1 << (bits - 1)) | 1


@pytest.mark.parametrize("bits", [512, 768, 1024, 2048, 4096])
def test_powmod_matches_cpython(bits):
    from phe_tpu import native

    rng = random.Random(bits)
    for _ in range(10):
        c = _random_odd(bits, rng)
        a = rng.randrange(c)
        b = rng.getrandbits(bits)
        assert native.powmod(a, b, c) == pow(a, b, c)


def test_powmod_edge_cases():
    from phe_tpu import native

    c = _random_odd(512, random.Random(7))
    assert native.powmod(0, 5, c) == 0
    assert native.powmod(5, 0, c) == 1
    assert native.powmod(0, 0, c) == 1  # pow(0, 0, c) == 1
    assert native.powmod(c + 3, 2, c) == pow(c + 3, 2, c)  # base reduced
    assert native.powmod(c - 1, c - 1, c) == pow(c - 1, c - 1, c)


def test_powmod_rejects_even_modulus():
    from phe_tpu import native

    with pytest.raises(ValueError):
        native.powmod(2, 3, 1 << 600)


def test_miller_rabin_known_primes_and_composites():
    from phe_tpu import native

    rng = random.Random(99)
    m521 = (1 << 521) - 1  # Mersenne prime
    ws = [rng.randrange(2, m521 - 2) for _ in range(8)]
    assert native.miller_rabin_native(m521, ws) is True

    comp = m521 * ((1 << 607) - 1)
    ws = [rng.randrange(2, comp - 2) for _ in range(8)]
    assert native.miller_rabin_native(comp, ws) is False

    # Carmichael-style stress: product of two close primes.
    p = nt.getprimeover(300)
    q = nt.getprimeover(300)
    ws = [rng.randrange(2, p * q - 2) for _ in range(8)]
    assert native.miller_rabin_native(p * q, ws) is False


def test_ntheory_dispatch_agrees_with_pure():
    rng = random.Random(5)
    c = _random_odd(1024, rng)
    a = rng.randrange(c)
    b = rng.getrandbits(1024)
    assert nt.powmod(a, b, c) == pow(a, b, c)
    # below-threshold sizes take the CPython path and still agree
    c_small = _random_odd(128, rng)
    assert nt.powmod(a % c_small, b, c_small) == pow(a, b, c_small)


def test_keygen_uses_native_and_roundtrips():
    import phe_tpu

    pub, priv = phe_tpu.generate_paillier_keypair(n_length=512)
    enc = pub.encrypt(42.5)
    assert priv.decrypt(enc) == 42.5
