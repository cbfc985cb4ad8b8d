"""Pallas kernel parity vs the XLA Montgomery engine and host ints.

The kernels in phe_tpu/ops/pallas_modexp.py implement identical math to
the XLA formulation (phe_tpu/ops/limb_math.py bounds); these tests pin
value-parity in interpret mode on CPU across modulus sizes and batch
shapes, including the lane-padding path (B not a multiple of the tile).
On TPU the same kernels are the production hot path (selected by
montgomery's backend dispatch).
"""

import secrets

import jax.numpy as jnp
import numpy as np
import pytest

from phe_tpu.ops import limb_math as lm
from phe_tpu.ops import montgomery as mg
from phe_tpu.ops import pallas_modexp as pmx
from phe_tpu.utils import limbs as hl

# On-hardware lane subset: PHE_TPU_TEST_PLATFORM=tpu pytest -m hardware_smoke
pytestmark = pytest.mark.hardware_smoke


def _vals(arr, mod):
    return [v % mod for v in hl.limbs_to_ints(np.asarray(arr))]


def _export(arr, ctx):
    plain = mg.export_canonical(mg.from_mont(jnp.asarray(arr), ctx), ctx)
    return hl.limbs_to_ints(np.asarray(plain))


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
    got = _vals(pmx.mont_mul(xm, ym, ctx, tb=8), mod)
    want = _vals(mg.redc(lm.mul_full(xm, ym), ctx), mod)
    assert got == want


def test_mont_pow_shared_matches_host_ints(modctx):
    mod, ctx = modctx
    L = ctx.num_limbs
    B = 3
    xs = [secrets.randbelow(mod) for _ in range(B)]
    xm = mg.to_mont(
        jnp.pad(jnp.asarray(hl.ints_to_limbs(xs, L)), ((0, 0), (0, 1))), ctx
    )
    e = secrets.randbits(192) | (1 << 191)
    digits = np.asarray(mg.exponent_digits(e, 192))
    out = pmx.mont_pow_shared(xm, digits, ctx, tb=8)
    assert _export(out, ctx) == [pow(x, e, mod) for x in xs]


def test_mont_pow_per_element_matches_host_ints(modctx):
    mod, ctx = modctx
    L = ctx.num_limbs
    es = [0, 1, 2, 0x1234567, secrets.randbits(64)]
    xs = [secrets.randbelow(mod) for _ in es]
    xm = mg.to_mont(
        jnp.pad(jnp.asarray(hl.ints_to_limbs(xs, L)), ((0, 0), (0, 1))), ctx
    )
    digits = np.stack([mg.exponent_digits(e, 64) for e in es])
    out = pmx.mont_pow(xm, jnp.asarray(digits), ctx, tb=8)
    assert _export(out, ctx) == [pow(x, e, mod) for x, e in zip(xs, es)]


def test_mont_pow_per_element_vs_xla(modctx):
    mod, ctx = modctx
    L = ctx.num_limbs
    es = [3, 17, 255, 256]
    xs = [secrets.randbelow(mod) for _ in es]
    xm = mg.to_mont(
        jnp.pad(jnp.asarray(hl.ints_to_limbs(xs, L)), ((0, 0), (0, 1))), ctx
    )
    digits = jnp.asarray(np.stack([mg.exponent_digits(e, 16) for e in es]))
    got = _vals(pmx.mont_pow(xm, digits, ctx, tb=8), mod)
    want = _vals(mg._mont_pow_xla(xm, digits, ctx), mod)
    assert got == want
