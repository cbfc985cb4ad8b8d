"""RNS Montgomery engine: exactness against Python integer arithmetic.

Validates the algebra of phe_tpu.ops.rns (the XLA reference twin of the
Pallas kernel): channel decomposition, the two base extensions, chain
bounds, conversions, and the full windowed ladder against pow(x, e, N).
"""

import random

import numpy as np
import pytest

import phe_tpu
from phe_tpu.ops import rns
from phe_tpu.ops import limb_math as lm
from phe_tpu.utils import limbs as hl


@pytest.fixture(scope="module")
def system():
    # N = n^2 for a 128-bit key: the shape of the Paillier obfuscation
    # modexp at test scale.
    pub, priv = phe_tpu.generate_paillier_keypair(n_length=128)
    return pub, priv, rns.build_rns(pub.nsquare)


def _products(sys_):
    m = np.asarray(sys_.m, dtype=np.uint64)
    k = sys_.k
    M_A = M_B = 1
    for a in m[:k]:
        M_A *= int(a)
    for b in m[k : 2 * k]:
        M_B *= int(b)
    return M_A, M_B


def _channel_values(sys_, value):
    """True (unscaled) residues of a host integer in every channel."""
    m = np.asarray(sys_.m, dtype=np.uint64)
    return np.array([value % int(mc) for mc in m], dtype=np.uint32)


def _stored_values(sys_, value):
    """Stored (tau-domain) residues: B rows carry the c_tau scale."""
    return np.asarray(rns.residues(value, sys_))


def _unscale(sys_, stored_row):
    """Stored residue row -> true residues (divide the scale back out)."""
    m = np.asarray(sys_.m, dtype=np.uint64)
    s = np.asarray(sys_.scale, dtype=np.uint64)
    return np.array(
        [
            int(v) * pow(int(sc), -1, int(mc)) % int(mc)
            for v, sc, mc in zip(stored_row, s, m)
        ],
        dtype=np.uint32,
    )


def test_build_invariants(system):
    pub, _, sys_ = system
    N = pub.nsquare
    M_A, M_B = _products(sys_)
    k = sys_.k
    assert M_A >= 4 * k * N and M_B >= 4 * k * N
    m = np.asarray(sys_.m)
    assert len(set(m[: 2 * k + 1].tolist())) == 2 * k + 1  # distinct primes
    assert (m > (1 << 13)).all() and (m < (1 << 14)).all()
    assert (m[2 * k :] == m[2 * k]).all()  # pads replicate m_r
    # Domain constants represent the reduced values (< N), not M_A itself
    # — the unreduced form breaks the chain bound at production sizes.
    # They are stored in tau-domain form (B rows scaled by c_tau).
    one = np.asarray(sys_.one_dom)
    np.testing.assert_array_equal(one, _stored_values(sys_, M_A % N))
    np.testing.assert_array_equal(
        np.asarray(sys_.r2_dom), _stored_values(sys_, M_A * M_A % N)
    )
    # The scale vector is 1 on A, r and pad rows.
    s = np.asarray(sys_.scale)
    assert (s[:k] == 1).all() and (s[2 * k :] == 1).all()


def test_to_rns_exact_including_redundant_limbs(system):
    pub, _, sys_ = system
    rng = random.Random(7)
    Lin = hl.num_limbs_for_bits(pub.nsquare.bit_length()) + 2
    conv = rns.build_conversion(sys_, Lin)
    # Redundant rows: limbs up to 2^14 inclusive.
    rows = np.asarray(
        [
            np.minimum(
                np.asarray(
                    hl.int_to_limbs(rng.getrandbits(14 * Lin - 20), Lin)
                )
                + rng.randrange(0, 2),
                1 << 14,
            )
            for _ in range(9)
        ],
        dtype=np.uint32,
    )
    got = np.asarray(rns.to_rns(rows, conv, sys_))
    for i in range(rows.shape[0]):
        value = hl.limbs_to_int(rows[i])
        np.testing.assert_array_equal(got[i], _stored_values(sys_, value))


def test_mont_mul_exact_and_bounded(system):
    pub, _, sys_ = system
    N = pub.nsquare
    M_A, M_B = _products(sys_)
    k = sys_.k
    bound = 2 * k * N
    rng = random.Random(3)
    xs = [rng.randrange(bound) for _ in range(8)]
    ys = [rng.randrange(bound) for _ in range(8)]
    X = np.stack([_stored_values(sys_, v) for v in xs])
    Y = np.stack([_stored_values(sys_, v) for v in ys])
    U = np.asarray(rns.rns_mont_mul(X, Y, sys_))
    ma_inv = pow(M_A, -1, N)
    for i in range(8):
        # Exact channel agreement with SOME representative u <= 2kN that
        # is congruent to x y M_A^-1 mod N: reconstruct u by CRT over all
        # channels (unique below M_A * m_r > bound) and check both.
        want_mod_N = xs[i] * ys[i] * ma_inv % N
        # CRT over base A + redundant channel (scale 1: stored = true).
        m = [int(v) for v in np.asarray(sys_.m[: k]).tolist()] + [
            int(sys_.m_r[0])
        ]
        r = U[i, :k].tolist() + [int(U[i, 2 * k])]
        u, mod = 0, 1
        for mi, ri in zip(m, r):
            t = (ri - u) * pow(mod, -1, mi) % mi
            u += mod * t
            mod *= mi
        assert u <= bound, "chain bound violated"
        assert u % N == want_mod_N
        # And every channel (incl. the scaled base-B rows) agrees with u.
        np.testing.assert_array_equal(U[i], _stored_values(sys_, u))


def test_from_rns_roundtrip(system):
    pub, _, sys_ = system
    _, M_B = _products(sys_)
    rng = random.Random(11)
    vals = [rng.randrange(M_B) for _ in range(8)] + [0, 1, M_B - 1]
    X = np.stack([_stored_values(sys_, v) for v in vals])
    out = np.asarray(rns.from_rns(X, sys_))
    for i, v in enumerate(vals):
        assert hl.limbs_to_int(out[i]) == v


def test_pow_shared_matches_python(system):
    pub, _, sys_ = system
    N = pub.nsquare
    rng = random.Random(5)
    Lin = hl.num_limbs_for_bits(N.bit_length())
    conv = rns.build_conversion(sys_, Lin)
    xs = [rng.randrange(1, N) for _ in range(4)] + [0, 1]
    e = pub.n  # the obfuscation exponent shape
    digits = rns.rns_pow_digits(e, e.bit_length())
    rows = np.asarray(hl.ints_to_limbs(xs, Lin))
    out = np.asarray(rns.pow_shared_xla(rows, digits, conv, sys_))
    for i, x in enumerate(xs):
        got = hl.limbs_to_int(out[i])
        assert got % N == pow(x, e, N)
        assert got <= sys_.k * N + 1


def test_pow_shared_various_exponents(system):
    pub, _, sys_ = system
    N = pub.nsquare
    rng = random.Random(13)
    Lin = hl.num_limbs_for_bits(N.bit_length())
    conv = rns.build_conversion(sys_, Lin)
    x = rng.randrange(1, N)
    rows = np.asarray(hl.ints_to_limbs([x], Lin))
    for e in [1, 2, 3, 16, (1 << 64) - 59, rng.getrandbits(200) | 1]:
        digits = rns.rns_pow_digits(e, max(e.bit_length(), 1))
        out = np.asarray(rns.pow_shared_xla(rows, digits, conv, sys_))
        assert hl.limbs_to_int(out[0]) % N == pow(x, e, N), e


def test_large_modulus_raises_and_engine_falls_back():
    # The channel supply (1,335 primes in (rns.M_MIN, 2^14)) caps the RNS
    # engine near 4380-bit keys for the mod-n^2 encrypt path. Bigger keys
    # must fall back to the limb engine instead of crashing.
    import phe_tpu

    n = (1 << 4607) | 1  # synthetic 4608-bit modulus (shape-only test)
    with pytest.raises(ValueError):
        rns.build_rns(n * n)
    pub = phe_tpu.PaillierPublicKey(n)
    assert pub.device_context().rns_state() is None


def test_4096_bit_keys_ride_the_rns_engine():
    # Round-4 extension: the 4099 channel floor brings 4096-bit keys onto
    # the fast engine (k=624, 1,249 channels, min prime ~4877). Build the
    # system for an 8192-bit modulus and pin a short-exponent ladder
    # against Python pow — this exercises channels below 2^13 (the
    # steps=3-everywhere Barrett regime).
    rng = random.Random(4096)
    N = rng.getrandbits(8192) | (1 << 8191) | 1
    sys_ = rns.build_rns(N)
    assert sys_.k == 624
    m_min = int(np.asarray(sys_.m).min())
    assert rns.M_MIN <= m_min < (1 << 13)
    Lin = hl.num_limbs_for_bits(N.bit_length())
    conv = rns.build_conversion(sys_, Lin)
    xs = [rng.randrange(1, N) for _ in range(2)] + [N - 1]
    e = rng.getrandbits(384) | 1
    digits = rns.rns_pow_digits(e, 384, window=5)
    rows = np.asarray(hl.ints_to_limbs(xs, Lin))
    out = np.asarray(
        rns.pow_shared_xla(rows, digits, conv, sys_, window=5)
    )
    for i, x in enumerate(xs):
        got = hl.limbs_to_int(out[i])
        assert got % N == pow(x, e, N)
        assert got <= sys_.k * N + 1


def test_default_keysize_rides_the_rns_engine():
    # The reference defaults to 3072-bit keys (phe/paillier.py:34); the
    # fast engine must cover them (round-3 verdict gap). Shape-only: the
    # system builds, takes 913 channels, and its min prime sits in the
    # widened (M_MIN, 2^13] window that makes this possible.
    n = (1 << 3071) | 1
    sys_ = rns.build_rns(n * n)
    assert sys_.k == 456
    m_min = int(np.asarray(sys_.m).min())
    assert rns.M_MIN <= m_min < (1 << 13)
    import phe_tpu

    assert phe_tpu.PaillierPublicKey(n).device_context().rns_state() is not None
