"""Backend-matrix lane: force the native C++ engine OFF and re-test.

The analog of the reference's PaillierUtilFallbacksTest
(phe/tests/util_test.py:62-75), which re-runs the whole util suite with
util.HAVE_GMP = util.HAVE_CRYPTO = False: here the native host engine
(phe_tpu.native) is forced off so every powmod/Miller-Rabin call exercises
the pure-CPython fallback even when the toolchain built the library — a
dispatch bug in ntheory's threshold logic fails these, not just the skip
in test_native.py.
"""

import pytest

from phe_tpu.utils import ntheory

from tests.test_ntheory import TestPowmodInvert, TestPrimes


@pytest.fixture(autouse=True)
def _force_native_off(monkeypatch):
    monkeypatch.setattr(ntheory, "HAVE_NATIVE", False)


class TestPowmodInvertNoNative(TestPowmodInvert):
    """The full powmod/invert suite on the pure-CPython path."""


class TestPrimesNoNative(TestPrimes):
    """The full prime/Miller-Rabin suite on the pure-CPython path."""


@pytest.mark.skipif(
    not ntheory.HAVE_NATIVE, reason="native backend unavailable"
)
def test_native_and_fallback_agree(monkeypatch):
    """Same results from both engines on the same inputs (equivalence)."""
    a = 2**2000 + 12345
    b = 2**1024 + 7
    c = 2**2048 - 159  # odd modulus above the native threshold
    with_native = ntheory.powmod(a, b, c)
    monkeypatch.setattr(ntheory, "HAVE_NATIVE", False)
    without = ntheory.powmod(a, b, c)
    assert with_native == without == pow(a, b, c)
