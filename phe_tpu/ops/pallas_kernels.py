"""Pallas TPU kernels for the Montgomery hot path.

The XLA formulation in phe_tpu.ops.montgomery leaves fusion decisions to
the compiler; these kernels pin the whole Montgomery multiply — schoolbook
outer product, anti-diagonal shear reduction, and both REDC multiplies —
into one VMEM-resident program per batch tile, so the [TB, L, L] partial
products never touch HBM. Same math, same bounds (see
phe_tpu/ops/limb_math.py): base-2^15 limbs in uint32, redundant carry form,
subtraction-free REDC.

Select with PHE_TPU_BACKEND=pallas (default: xla). Kernels run in
interpret mode automatically on CPU so the test suite exercises them
without TPU hardware.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from phe_tpu.ops import limb_math as lm


def _interpret():
    return jax.default_backend() != "tpu"


def _mul_full_block(a, b):
    """In-kernel schoolbook product, [TB, La] x [TB, Lb] -> [TB, La+Lb]."""
    outer = a[:, :, None] * b[:, None, :]
    lo = lm.diag_sum(outer & lm.LIMB_MASK)
    hi = lm.diag_sum(outer >> lm.LIMB_BITS)
    acc = jnp.pad(lo, ((0, 0), (0, 1))) + jnp.pad(hi, ((0, 0), (1, 0)))
    return lm.carry_fix(acc)


def _redc_block(t, m, m_prime, L):
    """In-kernel subtraction-free REDC of [TB, W] -> [TB, W-L]."""
    W = t.shape[-1]
    m_q = _mul_full_block(t[:, :L], jnp.broadcast_to(m_prime, (t.shape[0], L)))[
        :, :L
    ]
    mm = _mul_full_block(m_q, jnp.broadcast_to(m, (m_q.shape[0], L)))
    if W > 2 * L:
        mm = jnp.pad(mm, ((0, 0), (0, W - 2 * L)))
    u = lm.carry_fix(t + mm)
    low = u[:, :L]
    high = u[:, L:]
    carry = jnp.any(low != 0, axis=-1).astype(jnp.uint32)
    return lm.carry_fix(high.at[:, 0].add(carry))


def _mont_mul_kernel(a_ref, b_ref, m_ref, mp_ref, out_ref):
    t = _mul_full_block(a_ref[:, :], b_ref[:, :])
    out_ref[:, :] = _redc_block(t, m_ref[0, :], mp_ref[0, :], m_ref.shape[-1])


def _tile_rows(L):
    """Batch tile height: keep the [TB, L, L] outer product under ~4 MB."""
    budget = 4 * 1024 * 1024 // 4  # uint32 words
    tb = max(1, budget // max(L * L, 1))
    return 1 << min(6, (tb).bit_length() - 1)  # power of two, <= 64


@functools.partial(jax.jit, static_argnames=())
def mont_mul_pallas(a, b, ctx):
    """Drop-in Pallas replacement for montgomery.mont_mul on [B, L] inputs."""
    B, L = a.shape
    TB = _tile_rows(L)
    pad = (-B) % TB
    if pad:
        a = jnp.pad(a, ((0, pad), (0, 0)))
        b = jnp.pad(b, ((0, pad), (0, 0)))
    Bp = a.shape[0]
    m2 = ctx.m[None, :]
    mp2 = ctx.m_prime[None, :]
    out = pl.pallas_call(
        _mont_mul_kernel,
        out_shape=jax.ShapeDtypeStruct((Bp, L), jnp.uint32),
        grid=(Bp // TB,),
        in_specs=[
            pl.BlockSpec((TB, L), lambda i: (i, 0), memory_space=pltpu.ANY
                         if _interpret() else pltpu.VMEM),
            pl.BlockSpec((TB, L), lambda i: (i, 0), memory_space=pltpu.ANY
                         if _interpret() else pltpu.VMEM),
            pl.BlockSpec((1, L), lambda i: (0, 0), memory_space=pltpu.ANY
                         if _interpret() else pltpu.VMEM),
            pl.BlockSpec((1, L), lambda i: (0, 0), memory_space=pltpu.ANY
                         if _interpret() else pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TB, L), lambda i: (i, 0),
                               memory_space=pltpu.ANY
                               if _interpret() else pltpu.VMEM),
        interpret=_interpret(),
    )(a, b, m2, mp2)
    return out[:B]


def _mont_pow_shared_kernel(digits_ref, base_ref, m_ref, mp_ref, one_ref,
                            out_ref, window):
    """Full windowed modexp for one batch tile, entirely in VMEM.

    digits: [n_windows] int32 (scalar-prefetched), MSB first.
    """
    L = m_ref.shape[-1]
    m = m_ref[0, :]
    mp = mp_ref[0, :]
    base = base_ref[:, :]
    TB = base.shape[0]
    one = jnp.broadcast_to(one_ref[0, :], (TB, L)).astype(jnp.uint32)

    mul = lambda x, y: _redc_block(_mul_full_block(x, y), m, mp, L)

    # Windowed table [2**w, TB, L]
    K = 2 ** window

    def build(k, table):
        prev = table[k - 1]
        return table.at[k].set(mul(prev, base))

    table = jnp.zeros((K, TB, L), jnp.uint32).at[0].set(one).at[1].set(base)
    table = jax.lax.fori_loop(2, K, build, table)

    n_windows = digits_ref.shape[0]

    def step(w, acc):
        for _ in range(window):
            acc = mul(acc, acc)
        d = digits_ref[w]
        factor = jax.lax.dynamic_index_in_dim(table, d, 0, keepdims=False)
        return mul(acc, factor)

    acc = jax.lax.fori_loop(0, n_windows, step, one)
    out_ref[:, :] = acc


def mont_pow_shared_pallas(base, digits, ctx, window=4):
    """Shared-exponent modexp: the whole scan runs inside one kernel.

    base: [B, L] Montgomery domain; digits: [n_windows] int32 MSB-first.
    Versus the XLA scan, the accumulator and window table stay VMEM-
    resident across all iterations — zero HBM traffic between windows.
    """
    B, L = base.shape
    TB = _tile_rows(L)
    # Table adds K*TB*L words; shrink the tile to keep the budget.
    while TB > 1 and (2 ** window + 3) * TB * L * 4 > 8 * 1024 * 1024:
        TB //= 2
    pad = (-B) % TB
    if pad:
        base = jnp.pad(base, ((0, pad), (0, 0)))
    Bp = base.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Bp // TB,),
        in_specs=[
            pl.BlockSpec((TB, L), lambda i, _: (i, 0)),
            pl.BlockSpec((1, L), lambda i, _: (0, 0)),
            pl.BlockSpec((1, L), lambda i, _: (0, 0)),
            pl.BlockSpec((1, L), lambda i, _: (0, 0)),
        ],
        out_specs=pl.BlockSpec((TB, L), lambda i, _: (i, 0)),
    )
    out = pl.pallas_call(
        functools.partial(_mont_pow_shared_kernel, window=window),
        out_shape=jax.ShapeDtypeStruct((Bp, L), jnp.uint32),
        grid_spec=grid_spec,
        interpret=_interpret(),
    )(
        jnp.asarray(digits, jnp.int32),
        base,
        ctx.m[None, :],
        ctx.m_prime[None, :],
        ctx.one[None, :],
    )
    return out[:B]
