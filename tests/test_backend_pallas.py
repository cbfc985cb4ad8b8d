"""Force the Pallas dispatch lane on CPU (interpret mode).

The default CPU test run exercises the XLA formulation; production on TPU
routes through the Pallas kernels (montgomery._use_pallas). This module
re-runs the routed batch paths with PHE_TPU_BACKEND=pallas so a dispatch or
kernel-wrapper regression (e.g. the round-1 zero-sized-batch crash inside
jax.lax.associative_scan combine calls) fails in CI rather than only on
hardware.
"""

import numpy as np
import pytest

import phe_tpu
from phe_tpu.batch import EncryptedBatch
from phe_tpu.ops import montgomery as mg
from phe_tpu.ops import pallas_modexp as pm


@pytest.fixture(autouse=True)
def _force_pallas(monkeypatch):
    monkeypatch.setenv("PHE_TPU_BACKEND", "pallas")


@pytest.fixture(scope="module")
def keypair():
    return phe_tpu.generate_paillier_keypair(n_length=256)


VALUES = [0.5, -1.25, 3.0, 42.0, -7.5]


def test_encrypt_decrypt_roundtrip(keypair):
    pub, priv = keypair
    batch = EncryptedBatch.encrypt(pub, VALUES)
    assert batch.decrypt(priv) == VALUES


def test_sub(keypair):
    # Round-1 regression: __sub__ routes through mul_scalars whose
    # associative scans hand zero-sized slices to the Pallas wrappers.
    pub, priv = keypair
    a = EncryptedBatch.encrypt(pub, VALUES)
    b = EncryptedBatch.encrypt(pub, [1.0] * len(VALUES))
    assert (a - b).decrypt(priv) == [v - 1.0 for v in VALUES]


def test_mul_scalars_negative(keypair):
    pub, priv = keypair
    a = EncryptedBatch.encrypt(pub, VALUES)
    out = a.mul_scalars([-2.0] * len(VALUES)).decrypt(priv)
    assert out == [v * -2.0 for v in VALUES]


def test_dot(keypair):
    pub, priv = keypair
    a = EncryptedBatch.encrypt(pub, VALUES)
    w = [2.0, -1.0, 0.5, 1.0, -3.0]
    (got,) = a.dot(w).decrypt(priv)
    assert got == pytest.approx(float(np.dot(VALUES, w)))


def test_add_scalars_and_obfuscate(keypair):
    pub, priv = keypair
    a = EncryptedBatch.encrypt(pub, VALUES)
    out = (a + 10.0).obfuscate().decrypt(priv)
    assert out == [v + 10.0 for v in VALUES]


def test_zero_batch_kernel_wrappers(keypair):
    # Direct empty-batch calls into every Pallas wrapper (the scans above
    # reach them indirectly; this pins the contract).
    pub, _ = keypair
    ctx = pub.device_context().ctx
    L = ctx.num_limbs
    empty = np.zeros((L, 0), np.uint32)
    assert pm.mont_mul_cols(empty, empty, ctx).shape == (L, 0)
    assert pm.mont_mul_const_cols(empty, ctx.r2, ctx).shape == (L, 0)
    digits = np.zeros((8,), np.int32)
    assert pm.mont_pow_shared_cols(empty, digits, ctx).shape == (L, 0)
    vdigits = np.zeros((8, 0), np.int32)
    assert pm.mont_pow_cols(empty, vdigits, ctx).shape == (L, 0)
