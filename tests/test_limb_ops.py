"""Device limb/Montgomery engine vs exact host integer arithmetic.

Every kernel is validated against CPython big-int results on random inputs
at several modulus sizes (runs on the CPU backend in CI; the same programs
compile for TPU unchanged).
"""

import random

import jax.numpy as jnp
import numpy as np
import pytest

from phe_tpu.ops import limb_math as lm
from phe_tpu.ops import montgomery as mg
from phe_tpu.utils import limbs as hl
from phe_tpu.utils.ntheory import getprimeover

RNG = random.Random(20260817)


def rand_ints(bits, count):
    return [RNG.getrandbits(bits) for _ in range(count)]


def pack(values, L):
    return jnp.asarray(hl.ints_to_limbs(values, L))


def unpack(arr):
    return hl.limbs_to_ints(np.asarray(arr))


class TestLimbPrimitives:
    def test_carry_fix_preserves_value(self):
        # Top limbs stay small: carry out of the top limb is dropped by
        # design (callers bound values below array capacity).
        raw = np.array(
            [[0xFFFFFFF, 0x7FFF8000, 123, 0], [2**31 - 1, 2**30, 3, 4]],
            dtype=np.uint32,
        )
        fixed = np.asarray(lm.carry_fix(jnp.asarray(raw)))
        assert (fixed <= (1 << 15)).all()
        assert unpack(fixed) == unpack(raw)

    @pytest.mark.parametrize("bits", [60, 256, 1024])
    def test_mul_full(self, bits):
        L = hl.num_limbs_for_bits(bits)
        a_ints = rand_ints(bits, 8)
        b_ints = rand_ints(bits, 8)
        prod = lm.mul_full(pack(a_ints, L), pack(b_ints, L))
        assert unpack(prod) == [a * b for a, b in zip(a_ints, b_ints)]

    def test_mul_full_broadcast_groups(self):
        # Leading group dim: [G, B, L] x [G, B, L].
        L = hl.num_limbs_for_bits(128)
        a_ints = rand_ints(128, 6)
        b_ints = rand_ints(128, 6)
        a = pack(a_ints, L).reshape(2, 3, L)
        b = pack(b_ints, L).reshape(2, 3, L)
        prod = np.asarray(lm.mul_full(a, b)).reshape(6, 2 * L)
        assert unpack(prod) == [x * y for x, y in zip(a_ints, b_ints)]

    def test_mul_low(self):
        bits = 256
        L = hl.num_limbs_for_bits(bits)
        a_ints = rand_ints(bits, 8)
        b_ints = rand_ints(bits, 8)
        low = lm.mul_low(pack(a_ints, L), pack(b_ints, L), L)
        modulus = 1 << (lm.LIMB_BITS * L)
        got = unpack(low)
        want = [a * b % modulus for a, b in zip(a_ints, b_ints)]
        assert [g % modulus for g in got] == want

    def test_add(self):
        L = 20
        a_ints = rand_ints(250, 8)
        b_ints = rand_ints(250, 8)
        s = lm.add(pack(a_ints, L), pack(b_ints, L))
        assert unpack(s) == [a + b for a, b in zip(a_ints, b_ints)]

    def test_normalize_and_cond_sub(self):
        m = getprimeover(120) * getprimeover(120)
        L = mg.num_limbs_for_modulus(m.bit_length())
        comp = jnp.asarray(hl.int_to_limbs((1 << (lm.LIMB_BITS * L)) - m, L))
        xs = [0, 1, m - 1, m, m + 1, 2 * m - 1]
        arr = lm.normalize(pack(xs, L))
        out = lm.cond_sub(arr, comp, L)
        assert unpack(out) == [x % m for x in xs]


@pytest.fixture(scope="module", params=[256, 1024, 2048])
def mont_setup(request):
    bits = request.param
    half = getprimeover(bits // 2)
    other = getprimeover(bits // 2)
    modulus = half * other  # odd modulus, Paillier-shaped
    ctx = mg.build_context(modulus)
    return modulus, ctx


class TestMontgomery:
    def test_roundtrip(self, mont_setup):
        modulus, ctx = mont_setup
        xs = [RNG.randrange(modulus) for _ in range(8)]
        x = pack(xs, ctx.num_limbs)
        back = mg.export_canonical(mg.from_mont(mg.to_mont(x, ctx), ctx), ctx)
        assert unpack(back) == xs

    def test_mont_mul(self, mont_setup):
        modulus, ctx = mont_setup
        a_ints = [RNG.randrange(modulus) for _ in range(8)]
        b_ints = [RNG.randrange(modulus) for _ in range(8)]
        am = mg.to_mont(pack(a_ints, ctx.num_limbs), ctx)
        bm = mg.to_mont(pack(b_ints, ctx.num_limbs), ctx)
        prod = mg.export_canonical(mg.from_mont(mg.mont_mul(am, bm, ctx), ctx), ctx)
        assert unpack(prod) == [a * b % modulus for a, b in zip(a_ints, b_ints)]

    def test_mont_pow_shared(self, mont_setup):
        modulus, ctx = mont_setup
        bases = [RNG.randrange(1, modulus) for _ in range(4)]
        exponent = RNG.getrandbits(96) | (1 << 95)
        digits = jnp.asarray(mg.exponent_digits(exponent, 96))
        bm = mg.to_mont(pack(bases, ctx.num_limbs), ctx)
        out = mg.mont_pow_shared(bm, digits, ctx)
        out = mg.export_canonical(mg.from_mont(out, ctx), ctx)
        assert unpack(out) == [pow(b, exponent, modulus) for b in bases]

    def test_mont_pow_shared_leading_zero_windows(self, mont_setup):
        modulus, ctx = mont_setup
        bases = [RNG.randrange(1, modulus) for _ in range(2)]
        exponent = 5  # tiny exponent in a wide digit schedule
        digits = jnp.asarray(mg.exponent_digits(exponent, 64))
        bm = mg.to_mont(pack(bases, ctx.num_limbs), ctx)
        out = mg.export_canonical(
            mg.from_mont(mg.mont_pow_shared(bm, digits, ctx), ctx), ctx
        )
        assert unpack(out) == [pow(b, 5, modulus) for b in bases]

    def test_mont_pow_per_element(self, mont_setup):
        modulus, ctx = mont_setup
        bases = [RNG.randrange(1, modulus) for _ in range(6)]
        exps = [RNG.getrandbits(48) for _ in range(6)]
        digits = jnp.asarray(
            np.stack([mg.exponent_digits(e, 48) for e in exps])
        )
        bm = mg.to_mont(pack(bases, ctx.num_limbs), ctx)
        out = mg.export_canonical(
            mg.from_mont(mg.mont_pow(bm, digits, ctx), ctx), ctx
        )
        assert unpack(out) == [pow(b, e, modulus) for b, e in zip(bases, exps)]

    def test_pow_zero_exponent(self, mont_setup):
        modulus, ctx = mont_setup
        bases = [RNG.randrange(1, modulus) for _ in range(2)]
        digits = jnp.asarray(mg.exponent_digits(0, 16))
        bm = mg.to_mont(pack(bases, ctx.num_limbs), ctx)
        out = mg.export_canonical(
            mg.from_mont(mg.mont_pow_shared(bm, digits, ctx), ctx), ctx
        )
        assert unpack(out) == [1, 1]


class TestModReduce:
    @pytest.mark.parametrize("in_bits,mod_bits", [(512, 256), (4096, 2048)])
    def test_reduce_then_mont(self, in_bits, mod_bits):
        modulus = getprimeover(mod_bits // 2) * getprimeover(mod_bits // 2)
        ctx = mg.build_context(modulus)
        Lx = hl.num_limbs_for_bits(in_bits)
        table = mg.build_reduce_table(modulus, ctx, Lx)
        xs = rand_ints(in_bits, 6)
        reduced = mg.mod_reduce(pack(xs, Lx), ctx, table)
        # The reduction is only partial; verify congruence by completing
        # the pipeline through the Montgomery domain.
        back = mg.export_canonical(
            mg.from_mont(mg.to_mont(reduced, ctx), ctx), ctx
        )
        assert unpack(back) == [x % modulus for x in xs]

    def test_reduce_redundant_limbs_mxu_fold(self):
        # The decrypt pipeline feeds mod_reduce REDUNDANT limbs (<= 2**16
        # headroom); the MXU digit fold splits them into three 6-bit
        # planes, so the top plane carries up to 5 bits — pin exactness
        # at the extreme: every limb at the 2**16 ceiling, plus random
        # redundant rows.
        modulus = getprimeover(128) * getprimeover(128)
        ctx = mg.build_context(modulus)
        Lx = hl.num_limbs_for_bits(1024)
        assert Lx - ctx.num_limbs >= 8  # the fold takes the MXU path
        rows = np.vstack([
            np.full((1, Lx), 1 << 16, dtype=np.uint32),
            np.asarray(
                [[RNG.randrange(0, (1 << 16) + 1) for _ in range(Lx)]
                 for _ in range(5)],
                dtype=np.uint32,
            ),
        ])
        values = [
            sum(int(l) << (14 * j) for j, l in enumerate(row))
            for row in rows
        ]
        table = mg.build_reduce_table(modulus, ctx, Lx)
        reduced = mg.mod_reduce(jnp.asarray(rows), ctx, table)
        back = mg.export_canonical(
            mg.from_mont(mg.to_mont(reduced, ctx), ctx), ctx
        )
        assert unpack(back) == [v % modulus for v in values]


class TestConstMul:
    def test_const_mul_matches_mul_low_and_full(self):
        # The MXU band-matmul constant product must agree with the
        # generic limb product: modular truncation (mul_low semantics)
        # and the exact full product, on redundant inputs up to the
        # 2**16 headroom ceiling.
        La, Lc = 24, 24
        c = random.Random(5).getrandbits(14 * Lc - 3) | 1
        rngl = random.Random(6)
        rows = np.asarray(
            [[rngl.randrange(0, (1 << 16) + 1) for _ in range(La)]
             for _ in range(5)],
            dtype=np.uint32,
        )
        vals = [
            sum(int(l) << (14 * j) for j, l in enumerate(row))
            for row in rows
        ]
        # mod-2^(14*La) truncation
        t_low = mg.build_const_mul(c, La, La)
        low = lm.normalize(mg.const_mul(jnp.asarray(rows), t_low))
        got = [
            sum(int(l) << (14 * j) for j, l in enumerate(r))
            for r in np.asarray(low)
        ]
        assert got == [(v * c) % (1 << (14 * La)) for v in vals]
        # exact full product
        t_full = mg.build_const_mul(c, La, La + Lc)
        full = lm.normalize(mg.const_mul(jnp.asarray(rows), t_full))
        got = [
            sum(int(l) << (14 * j) for j, l in enumerate(r))
            for r in np.asarray(full)
        ]
        assert got == [v * c for v in vals]

    def test_const_mul_limb_cap(self):
        with pytest.raises(ValueError):
            mg.build_const_mul(3, 699, 699)
