"""Pallas kernel parity vs the XLA Montgomery engine (interpret mode on CPU).

The kernels implement identical math (phe_tpu/ops/limb_math.py bounds);
these tests pin value-parity against the XLA path across modulus sizes and
batch shapes, including the tile-padding path (B not a multiple of the
batch tile).
"""

import secrets

import jax.numpy as jnp
import numpy as np
import pytest

from phe_tpu.ops import montgomery as mg
from phe_tpu.ops import pallas_kernels as pk
from phe_tpu.utils import limbs as hl


def _vals(arr, mod):
    return [v % mod for v in hl.limbs_to_ints(np.asarray(arr))]


@pytest.fixture(scope="module", params=[256, 1024])
def modctx(request):
    bits = request.param
    mod = secrets.randbits(bits - 1) | (1 << (bits - 1)) | 1
    return mod, mg.build_context(mod)


@pytest.mark.parametrize("batch", [1, 5, 8])
def test_mont_mul_parity(modctx, batch):
    mod, ctx = modctx
    L = ctx.num_limbs
    xs = [secrets.randbelow(mod) for _ in range(batch)]
    ys = [secrets.randbelow(mod) for _ in range(batch)]
    xm = jnp.asarray(hl.ints_to_limbs(xs, L))
    ym = jnp.asarray(hl.ints_to_limbs(ys, L))
    assert _vals(pk.mont_mul_pallas(xm, ym, ctx), mod) == _vals(
        mg.mont_mul(xm, ym, ctx), mod
    )


def test_mont_pow_shared_parity(modctx):
    mod, ctx = modctx
    L = ctx.num_limbs
    B = 3
    xs = [secrets.randbelow(mod) for _ in range(B)]
    xm = jnp.asarray(hl.ints_to_limbs(xs, L))
    e = secrets.randbits(mod.bit_length())
    digits = np.asarray(mg.exponent_digits(e, mod.bit_length()))
    got = _vals(pk.mont_pow_shared_pallas(xm, digits, ctx), mod)
    want = _vals(mg.mont_pow_shared(xm, jnp.asarray(digits), ctx), mod)
    assert got == want


def test_mont_pow_matches_host_ints(modctx):
    mod, ctx = modctx
    L = ctx.num_limbs
    xs = [secrets.randbelow(mod) for _ in range(2)]
    xm = mg.to_mont(jnp.asarray(hl.ints_to_limbs(xs, L)), ctx)
    e = 0x1234567
    digits = np.asarray(mg.exponent_digits(e, 32))
    out = pk.mont_pow_shared_pallas(np.asarray(xm), digits, ctx)
    plain = mg.export_canonical(mg.from_mont(jnp.asarray(out), ctx), ctx)
    got = hl.limbs_to_ints(np.asarray(plain))
    assert got == [pow(x, e, mod) for x in xs]
