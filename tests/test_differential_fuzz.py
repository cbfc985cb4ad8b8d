"""Differential fuzz: random op sequences vs the live reference library.

A seeded randomized harness driving mixed op sequences (encrypt / add
enc+enc / add scalar / mul scalar / decrease_exponent_to / serialisation
round-trip / obfuscate / sum / matvec) through the reference ``phe``
package and ``EncryptedBatch`` on a shared key, comparing ciphertexts
bit-for-bit where the randomness is pinned and decryptions bit-for-bit
always — plus a dedicated hammer on the fast-decode boundary (mantissas
near 2^53 / 2^64, exponents near the float subnormal cliff, the issue-62
2^-965 region; batch.py _decrypt_fast's single-rounding argument).

Key-size matrix (round-4 verdict: fuzz must exercise the RNS engine at
its production channel counts, not only the 256-bit toy geometry):

* 256-bit — every lane, 8 rounds (semantics; one compiled shape bucket).
* 2048-bit (k=304) and 3072-bit (k=456, the reference's default
  keysize, phe/paillier.py:34) — the hardware-smoke lane
  (PHE_TPU_TEST_PLATFORM=tpu) runs them against compiled Mosaic
  kernels; off-TPU they are opt-in via PHE_TPU_FUZZ_ALL_KEYS=1 (the
  XLA/interpret engines are identical bit-for-bit but slow at these
  widths, so the default CPU lanes stay fast).

Soak knob: PHE_TPU_FUZZ_ROUNDS scales every round count (e.g. =10 for a
10x overnight soak).

Reference anchors: phe/tests/paillier_test.py:90-94 (the reference runs
its whole suite at the 3072-bit default), :363-385 (fuzzed add),
:698-721 (precision accumulation), :1088-1095 (issue 62).
"""

import math
import os
import random
import sys

import numpy as np
import pytest

REFERENCE_PATH = "/root/reference"
if REFERENCE_PATH not in sys.path:
    sys.path.insert(0, REFERENCE_PATH)
phe = pytest.importorskip("phe", reason="reference library not available")

import phe_tpu
from phe_tpu import serial
from phe_tpu.batch import EncryptedBatch

B = 8  # elements per fuzz round (one compiled shape bucket)

_SOAK = int(os.environ.get("PHE_TPU_FUZZ_ROUNDS", "1"))
_ON_TPU = os.environ.get("PHE_TPU_TEST_PLATFORM") == "tpu"
_ALL_KEYS = _ON_TPU or os.environ.get("PHE_TPU_FUZZ_ALL_KEYS") == "1"

_big = pytest.mark.skipif(
    not _ALL_KEYS,
    reason="production-geometry fuzz runs on the TPU lane "
    "(or PHE_TPU_FUZZ_ALL_KEYS=1)",
)
# (key_bits, fuzz_rounds, chain_ops): big keys run fewer rounds — each
# distinct op still compiles + runs at the real RNS channel counts.
_CONFIGS = [
    pytest.param((256, 8, 3), id="256"),
    pytest.param((2048, 2, 3), id="2048", marks=[_big, pytest.mark.hardware_smoke]),
    pytest.param((3072, 2, 3), id="3072", marks=[_big, pytest.mark.hardware_smoke]),
]


@pytest.fixture(scope="module", params=_CONFIGS)
def fuzz_cfg(request):
    bits, rounds, chain = request.param
    random.seed(20260820 + bits)
    ref_pub, ref_priv = phe.generate_paillier_keypair(n_length=bits)
    our_pub = phe_tpu.PaillierPublicKey(ref_pub.n)
    our_priv = phe_tpu.PaillierPrivateKey(our_pub, ref_priv.p, ref_priv.q)
    return ref_pub, ref_priv, our_pub, our_priv, rounds * _SOAK, chain


def _rand_value(rng):
    """Mixed-regime plaintexts: ints, floats across magnitudes/signs."""
    kind = rng.randrange(6)
    if kind == 0:
        return rng.randrange(-(10**12), 10**12)
    if kind == 1:
        return float(rng.randrange(-(10**6), 10**6))
    if kind == 2:
        return rng.uniform(-1e6, 1e6)
    if kind == 3:
        return rng.uniform(-1e-6, 1e-6)
    if kind == 4:
        return math.ldexp(rng.randrange(1, 1 << 53), rng.randrange(-80, 40)) * (
            -1 if rng.random() < 0.5 else 1
        )
    return 0 if rng.random() < 0.5 else -0.0


def _ciphertexts(batch):
    return batch.ciphertext_ints(be_secure=False)


def test_fuzz_op_sequences(fuzz_cfg):
    ref_pub, ref_priv, our_pub, our_priv, rounds, chain_ops = fuzz_cfg
    rng = random.Random(987654321)
    for round_i in range(rounds):
        vals = [_rand_value(rng) for _ in range(B)]
        rs = [rng.randrange(1, ref_pub.n) for _ in range(B)]
        ref = [ref_pub.encrypt(v, r_value=r) for v, r in zip(vals, rs)]
        ours = EncryptedBatch.encrypt(our_pub, vals, r_values=rs)
        # Pinned randomness: fresh ciphertexts must agree bit-for-bit.
        assert _ciphertexts(ours) == [
            e.ciphertext(be_secure=False) for e in ref
        ], f"fresh encrypt diverged (round {round_i})"

        for _ in range(chain_ops):
            op = rng.randrange(5)
            if op == 0:  # add enc+enc (unpinned addend: compare decrypts)
                vals2 = [_rand_value(rng) for _ in range(B)]
                rs2 = [rng.randrange(1, ref_pub.n) for _ in range(B)]
                ref2 = [
                    ref_pub.encrypt(v, r_value=r) for v, r in zip(vals2, rs2)
                ]
                ours2 = EncryptedBatch.encrypt(our_pub, vals2, r_values=rs2)
                ref = [a + b for a, b in zip(ref, ref2)]
                ours = ours + ours2
            elif op == 1:  # add scalar
                ss = [_rand_value(rng) for _ in range(B)]
                ref = [a + s for a, s in zip(ref, ss)]
                ours = ours + ss
            elif op == 2:  # mul scalar (mixed signs; ints and floats)
                ss = [
                    rng.choice(
                        [rng.randrange(-1000, 1000), rng.uniform(-100, 100)]
                    )
                    for _ in range(B)
                ]
                ref = [a * s for a, s in zip(ref, ss)]
                ours = ours * ss
            elif op == 3:  # decrease_exponent_to (forced alignment work)
                drop = rng.randrange(1, 5)
                targets = [int(e) - drop for e in ours.exponents]
                ref = [
                    a.decrease_exponent_to(t) for a, t in zip(ref, targets)
                ]
                ours = ours.decrease_exponent_to(targets)
            else:  # serialisation round-trip (must be a perfect no-op)
                wire = serial.dumps(serial.dump_encrypted_batch(
                    ours, be_secure=False, pin_exponent=False
                ))
                ours = serial.load_encrypted_batch(
                    serial.loads(wire), our_pub
                )

            # Every op is deterministic given the pinned encryptions:
            # ciphertexts AND exponents must track the reference exactly.
            assert list(ours.exponents) == [a.exponent for a in ref]
            assert _ciphertexts(ours) == [
                a.ciphertext(be_secure=False) for a in ref
            ], f"ciphertext diverged (round {round_i})"

        want = [ref_priv.decrypt(a) for a in ref]
        assert ours.decrypt(our_priv) == want, (
            f"decrypt diverged (round {round_i})"
        )

        # obfuscate(): fresh r^n blinding must change every ciphertext
        # and change no plaintext (phe/paillier.py:603-624 semantics).
        before = _ciphertexts(ours)
        blinded = ours.obfuscate()
        assert blinded.is_obfuscated
        after = blinded.ciphertext_ints(be_secure=False)
        assert all(a != b for a, b in zip(after, before)), (
            "obfuscation left a ciphertext unchanged"
        )
        assert blinded.decrypt(our_priv) == want, (
            f"obfuscated decrypt diverged (round {round_i})"
        )

    # sum(): compare against the reference's running sum.
    vals = [rng.uniform(-1e3, 1e3) for _ in range(B)]
    rs = [rng.randrange(1, ref_pub.n) for _ in range(B)]
    ref_enc = [ref_pub.encrypt(v, r_value=r) for v, r in zip(vals, rs)]
    our_enc = EncryptedBatch.encrypt(our_pub, vals, r_values=rs)
    assert our_enc.sum().decrypt(our_priv) == [
        ref_priv.decrypt(sum(ref_enc))
    ]

    # matvec: both rows against the reference's scalar dot
    # (sum of EncryptedNumber * x_j — the LR-scoring primitive,
    # examples/logistic_regression_encrypted_model.py:170-177).
    X = np.array(
        [[rng.uniform(-10, 10) for _ in range(B)] for _ in range(2)]
    )
    got = our_enc.matvec(X).decrypt(our_priv)
    want = [
        ref_priv.decrypt(sum(a * float(x) for a, x in zip(ref_enc, row)))
        for row in X
    ]
    assert got == want, "matvec diverged from the reference dot"


def test_fast_decode_boundary_hammer(fuzz_cfg):
    """Randomized sweep of _decrypt_fast's rounding corners.

    Mantissas adjacent to 2^53 and 2^64, exponents walking the subnormal
    cliff (float min exponent -1074; BASE-16 encoding exponents near
    -960: issue 62's 2^-965 lives here), and huge-magnitude values whose
    mantissa exceeds the 64-bit compact-decode window. Every value is
    decrypted through the batch pipeline and compared bit-for-bit with
    the reference decryption AND the original float.
    """
    ref_pub, ref_priv, our_pub, our_priv, rounds, _ = fuzz_cfg
    rng = random.Random(424242)
    corner_vals = []
    for _ in range(rounds * B // 2):
        kind = rng.randrange(4)
        if kind == 0:  # mantissa at the 2^53 double boundary
            m = (1 << 53) + rng.randrange(-2, 3)
            v = math.ldexp(m, rng.randrange(-1070, 60))
        elif kind == 1:  # mantissa crossing the 64-bit compact window
            m = (1 << 64) + rng.randrange(-3, 4)
            v = float(m * (1 if rng.random() < 0.5 else -1))
        elif kind == 2:  # subnormal cliff / issue-62 region
            v = math.ldexp(rng.randrange(1, 1 << 52), rng.randrange(-1074, -940))
        else:  # big floats near 4e64 (the verdict's flagged corner)
            v = rng.uniform(1e60, 1e70) * (-1 if rng.random() < 0.5 else 1)
        if v != 0.0 and math.isfinite(v):
            corner_vals.append(v)
    # pad to whole rounds of B
    while len(corner_vals) % B:
        corner_vals.append(1.0)
    for i in range(0, len(corner_vals), B):
        chunk = corner_vals[i : i + B]
        rs = [rng.randrange(1, ref_pub.n) for _ in range(B)]
        ref = [ref_pub.encrypt(v, r_value=r) for v, r in zip(chunk, rs)]
        ours = EncryptedBatch.encrypt(our_pub, chunk, r_values=rs)
        got = ours.decrypt(our_priv)
        want = [ref_priv.decrypt(a) for a in ref]
        assert got == want == chunk, f"boundary decrypt diverged at {chunk}"
