"""Pallas RNS ladder kernel vs the XLA reference twin (interpret mode)."""

import random

import numpy as np
import pytest

import phe_tpu
from phe_tpu.ops import rns
from phe_tpu.ops import pallas_rns
from phe_tpu.utils import limbs as hl


@pytest.fixture(scope="module")
def system():
    pub, priv = phe_tpu.generate_paillier_keypair(n_length=128)
    return pub, rns.build_rns(pub.nsquare)


def test_ladder_matches_xla_and_python(system):
    pub, sys_ = system
    N = pub.nsquare
    rng = random.Random(9)
    Lin = hl.num_limbs_for_bits(N.bit_length())
    conv = rns.build_conversion(sys_, Lin)
    xs = [rng.randrange(1, N) for _ in range(5)] + [0, 1]
    e = pub.n
    digits = rns.rns_pow_digits(e, e.bit_length())
    rows = np.asarray(hl.ints_to_limbs(xs, Lin))
    got = np.asarray(pallas_rns.pow_shared_rows(rows, digits, conv, sys_))
    ref = np.asarray(rns.pow_shared_xla(rows, digits, conv, sys_))
    np.testing.assert_array_equal(got, ref)  # bit-equal twins
    for i, x in enumerate(xs):
        assert hl.limbs_to_int(got[i]) % N == pow(x, e, N)


def test_ladder_lane_padding(system):
    # Batch sizes that are not multiples of the 128-lane tile.
    pub, sys_ = system
    N = pub.nsquare
    rng = random.Random(4)
    Lin = hl.num_limbs_for_bits(N.bit_length())
    conv = rns.build_conversion(sys_, Lin)
    xs = [rng.randrange(1, N) for _ in range(3)]
    digits = rns.rns_pow_digits(65537, 17)
    rows = np.asarray(hl.ints_to_limbs(xs, Lin))
    got = np.asarray(pallas_rns.pow_shared_rows(rows, digits, conv, sys_))
    for i, x in enumerate(xs):
        assert hl.limbs_to_int(got[i]) % N == pow(x, 65537, N)
